"""Build-system verification (SURVEY #41): the package builds as a
wheel, installs into a scratch prefix, and the installed copy (not the
source tree) imports and runs the CLI end-to-end."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_wheel_builds_and_installed_cli_runs(tmp_path):
    target = str(tmp_path / "site")
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--quiet", "--no-deps",
         "--no-build-isolation", "--target", target, REPO],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.isdir(os.path.join(target, "tomahawk_tpu"))
    # the native source ships with the package
    assert os.path.exists(os.path.join(
        target, "tomahawk_tpu", "native", "twk_native.cpp"))

    # drive the INSTALLED package (source tree shadowed away)
    vcf = tmp_path / "t.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n##contig=<ID=1,length=1000>\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts0\ts1"
        "\ts2\ts3\ts4\ts5\n"
        "1\t10\t.\tA\tC\t9\tPASS\t.\tGT\t0|1\t1|1\t0|0\t0|1\t1|0\t0|0\n"
        "1\t20\t.\tG\tT\t9\tPASS\t.\tGT\t1|1\t0|1\t0|0\t0|1\t0|0\t1|0\n"
        "1\t30\t.\tT\tA\t9\tPASS\t.\tGT\t0|0\t0|1\t1|1\t0|0\t1|0\t0|1\n")
    script = (
        "import sys, os\n"
        f"sys.path.insert(0, {target!r})\n"
        "import tomahawk_tpu\n"
        f"assert tomahawk_tpu.__file__.startswith({target!r}), "
        "tomahawk_tpu.__file__\n"
        "from tomahawk_tpu.io.importer import ImportSettings, import_vcf\n"
        f"st = import_vcf(ImportSettings(input={str(vcf)!r}, "
        f"output={str(tmp_path / 't.twk')!r}))\n"
        "assert st.n_kept == 3, st.n_kept\n"
        "from tomahawk_tpu.io.twk import TwkReader\n"
        f"r = TwkReader({str(tmp_path / 't.twk')!r})\n"
        "assert sum(1 for _ in r.records()) == 3\n"
        "print('INSTALLED_OK')\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=240,
                       cwd=str(tmp_path), env=env)
    assert r.returncode == 0 and "INSTALLED_OK" in r.stdout, \
        r.stdout[-2000:] + r.stderr[-3000:]
