"""In-run checkpoint/resume of `calc` (SURVEY §5.4: the reference's
only retry unit is a whole -c/-C chunk; the TPU engine checkpoints at
sweep-segment granularity into a sidecar file and resumes by truncating
the output to the last checkpointed offset)."""

import os

import numpy as np
import pytest

from test_importer import make_vcf

from tomahawk_tpu.compute.engine import (CalcSettings, LdEngine,
                                         compute_ld)
from tomahawk_tpu.io.importer import ImportSettings, import_vcf
from tomahawk_tpu.io.two import TwoReader


def _settings(twk, out, ckpt="", **kw):
    base = dict(input=twk, output=out, min_r2=0.0, min_p=1.0,
                mesh="off", tile_rows=16, sweep_segment=16,
                checkpoint=ckpt, checkpoint_interval=0.0)
    base.update(kw)
    return CalcSettings(**base)


@pytest.fixture()
def archive(tmp_path):
    vcf = str(tmp_path / "in.vcf")
    make_vcf(vcf, n_samples=40, n_sites=200, seed=11, miss_frac=0.04,
             contigs=("20",))
    twk = str(tmp_path / "in.twk")
    import_vcf(ImportSettings(input=vcf, output=twk, block_size=16))
    return twk


def _crash_after(monkeypatch, n_segments):
    """Patch LdEngine._run_segment to raise after n successful calls."""
    orig = LdEngine._run_segment
    calls = {"n": 0}

    def wrapper(self, *a, **kw):
        if calls["n"] >= n_segments:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(LdEngine, "_run_segment", wrapper)
    return calls


def test_resume_after_crashes(tmp_path, archive, monkeypatch):
    """Two mid-run crashes, then a clean resume: the final output must
    equal an uninterrupted run record-for-record (same order), and the
    sidecar must be gone. A tiny plane budget forces banded streaming,
    so the whole-load skip path (no host unpack for loads completed
    before the checkpoint) is exercised too."""
    ref = str(tmp_path / "ref.two")
    compute_ld(_settings(archive, ref, memory_gb=2e-5))

    out = str(tmp_path / "ck.two")
    ckpt = str(tmp_path / "calc.ckpt")
    for crash_at in (2, 3):
        calls = _crash_after(monkeypatch, crash_at)
        with pytest.raises(RuntimeError, match="simulated crash"):
            compute_ld(_settings(archive, out, ckpt, memory_gb=2e-5))
        assert calls["n"] == crash_at
        assert os.path.exists(ckpt)
        monkeypatch.undo()

    res = compute_ld(_settings(archive, out, ckpt, memory_gb=2e-5))
    assert not os.path.exists(ckpt), "sidecar must be deleted on success"

    a = TwoReader(ref).records()
    b = TwoReader(out).records()
    assert len(a) == len(b) > 0
    for f in a.dtype.names:
        np.testing.assert_array_equal(a[f], b[f], err_msg=f)

    # the resumed result reports whole-run totals, not just the tail
    full = compute_ld(_settings(archive, str(tmp_path / "again.two"),
                                memory_gb=2e-5))
    assert res.n_pairs == full.n_pairs
    assert res.n_records == full.n_records


def test_resume_skips_completed_segments(tmp_path, archive, monkeypatch):
    """A resumed run must not recompute checkpointed segments."""
    out = str(tmp_path / "ck.two")
    ckpt = str(tmp_path / "calc.ckpt")
    calls = _crash_after(monkeypatch, 4)
    with pytest.raises(RuntimeError):
        compute_ld(_settings(archive, out, ckpt))
    monkeypatch.undo()

    ran = []
    orig = LdEngine._run_segment

    def counting(self, *a, **kw):
        ran.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(LdEngine, "_run_segment", counting)
    compute_ld(_settings(archive, out, ckpt))
    total = len(ran)
    monkeypatch.undo()

    uninterrupted = []

    def counting2(self, *a, **kw):
        uninterrupted.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(LdEngine, "_run_segment", counting2)
    compute_ld(_settings(archive, str(tmp_path / "full.two")))
    assert total == len(uninterrupted) - 4


def test_checkpoint_config_mismatch(tmp_path, archive, monkeypatch):
    out = str(tmp_path / "ck.two")
    ckpt = str(tmp_path / "calc.ckpt")
    _crash_after(monkeypatch, 2)
    with pytest.raises(RuntimeError):
        compute_ld(_settings(archive, out, ckpt))
    monkeypatch.undo()
    with pytest.raises(ValueError, match="different settings"):
        compute_ld(_settings(archive, out, ckpt, min_r2=0.5))


def test_checkpoint_rejects_stdout_and_dcn(tmp_path, archive,
                                           monkeypatch):
    # dcn meshes DO checkpoint since round 5 (process 0's sidecar,
    # broadcast at resume -- test_multihost.py dcn kill+resume e2e);
    # the only remaining refusal is an unseekable output
    with pytest.raises(ValueError, match="file output"):
        compute_ld(_settings(archive, "-", str(tmp_path / "c.ckpt")))


def test_checkpoint_rejects_output_change(tmp_path, archive, monkeypatch):
    """The output path is part of the config fingerprint: resuming the
    same sidecar against a different -o must not truncate/append the
    other file."""
    ckpt = str(tmp_path / "calc.ckpt")
    _crash_after(monkeypatch, 2)
    with pytest.raises(RuntimeError):
        compute_ld(_settings(archive, str(tmp_path / "a.two"), ckpt))
    monkeypatch.undo()
    with pytest.raises(ValueError, match="different settings"):
        compute_ld(_settings(archive, str(tmp_path / "b.two"), ckpt))


def test_resume_with_missing_output(tmp_path, archive, monkeypatch):
    from tomahawk_tpu.io.errors import CorruptFileError
    out = str(tmp_path / "a.two")
    ckpt = str(tmp_path / "calc.ckpt")
    _crash_after(monkeypatch, 2)
    with pytest.raises(RuntimeError):
        compute_ld(_settings(archive, out, ckpt))
    monkeypatch.undo()
    os.remove(out)
    with pytest.raises(CorruptFileError, match="output is missing"):
        compute_ld(_settings(archive, out, ckpt))
