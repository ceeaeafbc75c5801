"""Chip-contention detector for performance artifacts.

The TPU relay on this class of host serialises executions from all processes,
so any latency/throughput number measured while a trainer owns the relay is
invalid (PERFORMANCE.md measurement rule). Every diagnostics writer stamps
its JSON with this status so each artifact is trustworthy standalone
(VERDICT r2 #8). Detection is by exact-argv /proc scan — never a pattern
match (a pattern can match unrelated shells quoting these names).
"""

from __future__ import annotations

import os
import pathlib

# Processes whose presence invalidates chip-latency measurements.
CONTENDERS = ("train_model.py", "evaluate_model.py", "bench.py")


def contending_processes(extra: tuple[str, ...] = ()) -> list[dict]:
    """Live processes whose argv[1] basename is a known relay contender.

    Only matches real script invocations (interpreter argv[0] + script path
    argv[1]); excludes this process and its ancestors.
    """
    targets = CONTENDERS + extra
    me = os.getpid()
    ancestors = set()
    p = me
    while p > 1:
        ancestors.add(p)
        try:
            with open(f"/proc/{p}/stat") as f:
                p = int(f.read().split(") ")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
    found = []
    for d in pathlib.Path("/proc").iterdir():
        if not d.name.isdigit():
            continue
        pid = int(d.name)
        if pid == me or pid in ancestors:
            continue
        try:
            argv = (d / "cmdline").read_bytes().split(b"\0")
        except OSError:
            continue
        argv = [a.decode(errors="replace") for a in argv if a]
        if len(argv) < 2:
            continue
        # Versioned interpreters (python3.12) and option flags
        # (`python3 -u script.py`) must not hide a contender — a missed
        # trainer stamps an invalid measurement chip_quiet: true, the
        # exact failure this module exists to prevent.
        if not os.path.basename(argv[0]).startswith("python"):
            continue
        script = next((a for a in argv[1:] if not a.startswith("-")), "")
        base = os.path.basename(script)
        if base in targets:
            found.append({"pid": pid, "script": base})
    return found


def chip_quiet_status() -> dict:
    """{"chip_quiet": bool, "contenders": [...]} — merge into every
    diagnostics JSON at write time."""
    procs = contending_processes()
    return {"chip_quiet": not procs, "contenders": procs}
