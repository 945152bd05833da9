"""`view`: convert .two to human-readable LD text (or filtered .two).

Mirrors the reference view subcommand (reference: lib/view.h): applies
the record filter chain and either prints the tab-separated LD format
(reference: lib/core.cpp:520-526 PrintLD) or writes a filtered binary
.two file.
"""

import sys
from typing import Optional

import numpy as np

from ..io.two import TwoReader, TwoWriter
from .filters import TwoFilter
from .intervals import parse_intervals, interval_mask

LD_HEADER = ("FLAG\tCHROM_A\tPOS_A\tCHROM_B\tPOS_B\tREF_REF\tREF_ALT\t"
             "ALT_REF\tALT_ALT\tD\tDprime\tR\tR2\tP\tChiSqFisher\t"
             "ChiSqModel")


def _fmt(v: float) -> str:
    """C++ ostream default: 6 significant digits."""
    return f"{v:.6g}"


def view(path: str, output: Optional[str] = None,
         filt: Optional[TwoFilter] = None, intervals=None,
         show_header: bool = True, binary: bool = False,
         out_stream=None):
    """Stream records; returns number of records emitted."""
    reader = TwoReader(path)
    filt = filt or TwoFilter()
    ivals = parse_intervals(intervals, reader.header) if intervals else None

    n_out = 0
    writer = None
    stream = out_stream or sys.stdout
    if binary:
        from ..utils.logging import stamp_literals
        stamp_literals(reader.header, "view", path)
        writer = TwoWriter(output or "-", reader.header)
    else:
        if show_header:
            lit = reader.header.literals
            if lit:
                stream.write(lit if lit.endswith("\n") else lit + "\n")
            stream.write(LD_HEADER + "\n")

    names = {c.idx: c.name for c in reader.header.contigs}
    for recs in reader.blocks():
        m = filt.mask(recs)
        if ivals is not None:
            m &= interval_mask(recs, ivals)
        sel = recs[m]
        if len(sel) == 0:
            continue
        n_out += len(sel)
        if binary:
            writer.add(sel)
        else:
            pos_a = (sel["packA"] >> 2) + 1
            pos_b = (sel["packB"] >> 2) + 1
            for r, pa, pb in zip(sel, pos_a, pos_b):
                cnt = r["cnt"]
                stream.write(
                    f"{r['controller']}\t{names.get(int(r['ridA']), r['ridA'])}"
                    f"\t{pa}\t{names.get(int(r['ridB']), r['ridB'])}\t{pb}\t"
                    f"{_fmt(cnt[0])}\t{_fmt(cnt[1])}\t{_fmt(cnt[2])}\t"
                    f"{_fmt(cnt[3])}\t{_fmt(r['D'])}\t{_fmt(r['Dprime'])}\t"
                    f"{_fmt(r['R'])}\t{_fmt(r['R2'])}\t{_fmt(r['P'])}\t"
                    f"{_fmt(r['ChiSqFisher'])}\t{_fmt(r['ChiSqModel'])}\n")
    if writer is not None:
        writer.close()
    reader.close()
    return n_out
