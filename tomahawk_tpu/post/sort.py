"""External merge sort of .two files.

Mirrors the reference two-phase design (reference: lib/two_reader.cpp:
162-422, lib/two_sorter_structs.h): phase 1 sorts memory-capped runs of
records by (ridA, ridB, Apos, Bpos) and spills them as zstd-compressed
temporary chunks; phase 2 k-way-merges the runs into a sorted .two file
with a TWK_IDX_SORTED index and per-contig meta entries. Record-level
sorting uses numpy lexsort; the merge is a heap over run cursors.
"""

import heapq
import os
import struct
import tempfile

import numpy as np
import zstandard

from ..io.constants import TWK_IDX_SORTED
from ..io.two import TWO_DTYPE, TwoReader, TwoWriter
from ..utils import Timer, log, pretty_int


def _sort_indices(recs: np.ndarray) -> np.ndarray:
    """Lexsort by (ridA, ridB, Apos, Bpos) — reference twk1_two_t
    operator< (lib/core.cpp:458-468)."""
    return np.lexsort((recs["packB"] >> 2, recs["packA"] >> 2,
                       recs["ridB"], recs["ridA"]))


def sort_two(input_path: str, output_path: str,
             memory_limit_gb: float = 0.5, run_chunk: int = 10000) -> int:
    timer = Timer()
    reader = TwoReader(input_path)
    if not output_path.endswith(".two"):
        output_path += ".two"

    limit_recs = max(run_chunk,
                     int(memory_limit_gb * (1 << 30) / TWO_DTYPE.itemsize))

    # ---------------- phase 1: sorted runs -> temp file ----------------
    tmp_fd, tmp_path = tempfile.mkstemp(suffix=".twk_sort",
                                        dir=os.path.dirname(
                                            os.path.abspath(output_path)))
    runs = []  # list of (foff, fend, n)
    cctx = zstandard.ZstdCompressor(level=1)
    n_total = 0
    with os.fdopen(tmp_fd, "wb") as tmp:
        buf = []
        buf_n = 0

        def flush_run():
            nonlocal buf, buf_n
            if buf_n == 0:
                return
            recs = np.concatenate(buf)
            recs = recs[_sort_indices(recs)]
            foff = tmp.tell()
            # stream-compress the run in fixed chunks
            chunks = []
            for s in range(0, len(recs), run_chunk):
                part = recs[s:s + run_chunk]
                comp = cctx.compress(part.tobytes())
                chunks.append((len(part), len(comp)))
                tmp.write(struct.pack("<II", len(part), len(comp)))
                tmp.write(comp)
            runs.append((foff, tmp.tell(), len(recs)))
            buf, buf_n = [], 0

        for blk in reader.blocks():
            buf.append(blk)
            buf_n += len(blk)
            n_total += len(blk)
            if buf_n >= limit_recs:
                flush_run()
        flush_run()
        tmp.flush()   # phase 2 reads via a separate handle

        # ------------- phase 2: k-way merge of runs -> writer -------------
        log("LOG", f"Merging {len(runs)} run(s), "
            f"{pretty_int(n_total)} records...", sub="SORT")
        writer = TwoWriter(output_path, reader.header,
                           state=TWK_IDX_SORTED)
        dctx = zstandard.ZstdDecompressor()

        class RunCursor:
            __slots__ = ("fh", "pos", "end", "recs", "i", "dctx")

            def __init__(self, path, foff, fend):
                self.fh = open(path, "rb")
                self.pos = foff
                self.end = fend
                self.recs = None
                self.i = 0
                self._advance_chunk()

            def _advance_chunk(self):
                if self.pos >= self.end:
                    self.recs = None
                    return
                self.fh.seek(self.pos)
                n, nc = struct.unpack("<II", self.fh.read(8))
                data = dctx.decompress(self.fh.read(nc),
                                       max_output_size=n *
                                       TWO_DTYPE.itemsize)
                self.pos = self.fh.tell()
                self.recs = np.frombuffer(data, TWO_DTYPE)
                self.i = 0

            def head_key(self):
                r = self.recs[self.i]
                return (int(r["ridA"]), int(r["ridB"]),
                        int(r["packA"]) >> 2, int(r["packB"]) >> 2)

            def pop(self):
                r = self.recs[self.i]
                self.i += 1
                if self.i >= len(self.recs):
                    self._advance_chunk()
                return r

            def exhausted(self):
                return self.recs is None

        if len(runs) == 1:
            # single run: stream chunks straight through
            cur = RunCursor(tmp_path, runs[0][0], runs[0][1])
            while not cur.exhausted():
                recs = cur.recs[cur.i:]
                writer.add(recs)
                cur._advance_chunk()
            cur.fh.close()
        else:
            cursors = [RunCursor(tmp_path, f, e) for f, e, _ in runs]
            heap = [(c.head_key(), k) for k, c in enumerate(cursors)
                    if not c.exhausted()]
            heapq.heapify(heap)
            out_buf = np.zeros(run_chunk, TWO_DTYPE)
            out_n = 0
            while heap:
                _, k = heapq.heappop(heap)
                out_buf[out_n] = cursors[k].pop()
                out_n += 1
                if out_n == run_chunk:
                    writer.add(out_buf.copy())
                    out_n = 0
                if not cursors[k].exhausted():
                    heapq.heappush(heap, (cursors[k].head_key(), k))
            if out_n:
                writer.add(out_buf[:out_n].copy())
            for c in cursors:
                c.fh.close()
        writer.close()
    os.unlink(tmp_path)
    reader.close()
    log("LOG", f"Sorted {pretty_int(n_total)} records in "
        f"{timer.elapsed_string()}", sub="SORT")
    return n_total
