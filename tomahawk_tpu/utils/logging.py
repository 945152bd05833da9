"""Timestamped stderr logging, mirroring the reference CLI conventions
(reference: lib/utility.cpp utility::timestamp)."""

import sys
import datetime

SILENT = False


def timestamp(level: str, sub: str = "") -> str:
    now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S,%f")[:-3]
    tag = f"[{now}][{level}]" if not sub else f"[{now}][{level}][{sub}]"
    return tag + " "


def log(level: str, *msg, sub: str = ""):
    if SILENT:
        return
    print(timestamp(level, sub) + " ".join(str(m) for m in msg),
          file=sys.stderr, flush=True)


def pretty_int(n) -> str:
    return f"{int(n):,}"
