"""Genomic interval parsing and filtering.

Reimplements the reference interval surface (reference:
include/intervals.h, lib/intervals.cpp): interval strings of the forms
  contig | contig:pos | contig:from-to
optionally linked pairwise as "ivalA;ivalB" to constrain both sides of
a .two record. Positions may use scientific notation (e.g. 1e6) and are
1-based inclusive on input, converted to 0-based internally.
"""

import re
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

_NUM = r"[0-9]+(?:\.[0-9]+)?(?:[eE][0-9]+)?"
_RE_CONTIG = re.compile(r"^[A-Za-z0-9\-_\.]+$")
_RE_POS = re.compile(rf"^([A-Za-z0-9\-_\.]+):({_NUM})$")
_RE_RANGE = re.compile(rf"^([A-Za-z0-9\-_\.]+):({_NUM})-({_NUM})$")


@dataclass
class Interval:
    rid: int
    start: int   # 0-based inclusive
    end: int     # 0-based inclusive
    linked: Optional["Interval"] = None


def _parse_one(s: str, header) -> Interval:
    m = _RE_RANGE.match(s)
    if m:
        rid = header.contig_rid(m.group(1))
        if rid < 0:
            raise ValueError(f"unknown contig in interval: {m.group(1)}")
        start = int(float(m.group(2))) - 1
        end = int(float(m.group(3))) - 1
        if end < start:
            raise ValueError(f"interval end < start: {s}")
        return Interval(rid, max(start, 0), end)
    m = _RE_POS.match(s)
    if m:
        rid = header.contig_rid(m.group(1))
        if rid < 0:
            raise ValueError(f"unknown contig in interval: {m.group(1)}")
        p = int(float(m.group(2))) - 1
        return Interval(rid, max(p, 0), max(p, 0))
    if _RE_CONTIG.match(s):
        rid = header.contig_rid(s)
        if rid < 0:
            raise ValueError(f"unknown contig in interval: {s}")
        return Interval(rid, 0, 2**30 - 1)
    raise ValueError(f"cannot parse interval: {s}")


def parse_intervals(strings, header) -> List[Interval]:
    out = []
    for s in strings or []:
        # linked two-sided interval: the reference separates with ','
        # (intervals.h:117-127); ';' is accepted as well
        sep = ";" if ";" in s else ("," if "," in s else None)
        if sep:
            a, b = s.split(sep, 1)
            iv = _parse_one(a.strip(), header)
            iv.linked = _parse_one(b.strip(), header)
            out.append(iv)
        else:
            out.append(_parse_one(s.strip(), header))
    return out


def interval_mask(recs: np.ndarray, ivals: List[Interval]) -> np.ndarray:
    """True where a .two record overlaps any interval. Unlinked
    intervals match on either side; linked pairs require A in the first
    and B in the second (or the swap)."""
    if not ivals:
        return np.ones(len(recs), bool)
    pos_a = (recs["packA"] >> 2).astype(np.int64)
    pos_b = (recs["packB"] >> 2).astype(np.int64)
    rid_a = recs["ridA"].astype(np.int64)
    rid_b = recs["ridB"].astype(np.int64)
    m = np.zeros(len(recs), bool)
    for iv in ivals:
        in_a = (rid_a == iv.rid) & (pos_a >= iv.start) & (pos_a <= iv.end)
        in_b = (rid_b == iv.rid) & (pos_b >= iv.start) & (pos_b <= iv.end)
        if iv.linked is None:
            m |= in_a | in_b
        else:
            lv = iv.linked
            in_a2 = (rid_a == lv.rid) & (pos_a >= lv.start) & \
                (pos_a <= lv.end)
            in_b2 = (rid_b == lv.rid) & (pos_b >= lv.start) & \
                (pos_b <= lv.end)
            m |= (in_a & in_b2) | (in_a2 & in_b)
    return m


def blocks_for_intervals(reader, strings) -> List[int]:
    """Block indices of a .twk archive overlapping any interval."""
    ivals = parse_intervals(strings, reader.header)
    keep = []
    for i, e in enumerate(reader.index.ent):
        for iv in ivals:
            # index positions are 1-based right-open (pos+1 convention)
            if e.rid == iv.rid and e.minpos - 1 <= iv.end \
                    and e.maxpos - 1 >= iv.start:
                keep.append(i)
                break
    return keep
