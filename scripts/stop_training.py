#!/usr/bin/env python
"""Stop all training helpers by exact argv match (never by pattern).

Pattern kills (pkill -f / pgrep -f) are unsafe here: unrelated processes
(including the orchestration session driving this repo) can carry these
script names inside a quoted -c string. This scanner only matches processes
whose argv is literally ["bash"|"python"(3), "<path ending in target>", ...]
— i.e. the interpreter is argv[0] and the script is its own argv element —
which cannot match a shell -c wrapper.

Order: supervisors first (so nothing restarts), then the trainer with
SIGTERM (it saves orbax state per epoch; 143 is a clean supervised exit),
then SIGKILL for stragglers.
"""

from __future__ import annotations

import os
import pathlib
import signal
import sys
import time

SUPERVISORS = ("queue_y11n.sh", "train_supervised.sh", "babysit_trainer.sh",
               "checkpoint_commit.sh")
TRAINERS = ("train_model.py",)
# Processes that actually own the chip/relay. The ckpt snapshotter
# (checkpoint_commit.sh) is an immortal CPU-side loop: including it in an
# idle-wait deadlocks the training chains after a natural run completion
# (it only ever "went idle" before because bench parks killed it too).
CHIP_OWNERS = ("queue_y11n.sh", "train_supervised.sh", "babysit_trainer.sh",
               "train_model.py")


def matches(argv: list[str], targets: tuple[str, ...]) -> bool:
    if len(argv) < 2:
        return False
    interp = os.path.basename(argv[0])
    # Versioned interpreters (python3.12) and option flags (-u) count too —
    # mirrors chipquiet.py's detection (ADVICE r3): a trainer launched as
    # "python3.12 -u train_model.py" must be parked, not just stamped.
    if interp not in ("bash", "sh") and not interp.startswith("python"):
        return False
    script = ""
    for a in argv[1:]:
        if a == "-c":
            # Command-string mode: the next argv is CODE, not a script
            # path — a -c wrapper that merely mentions these names (e.g.
            # the orchestration session) must never be killed.
            return False
        if a.startswith("-"):
            continue
        script = a
        break
    if any(ch in script for ch in " ;\n"):
        return False  # a command string, not a path
    # Exact basename equality, not endswith: an unrelated script with a
    # suffix-matching name (my_train_model.py) must not be killed (ADVICE r2).
    return os.path.basename(script) in targets


def scan(targets: tuple[str, ...]) -> list[int]:
    me = os.getpid()
    parents = set()
    p = me
    while p > 1:  # never touch our own ancestry
        parents.add(p)
        try:
            with open(f"/proc/{p}/stat") as f:
                p = int(f.read().split(") ")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
    pids = []
    for d in pathlib.Path("/proc").iterdir():
        if not d.name.isdigit():
            continue
        pid = int(d.name)
        if pid == me or pid in parents:
            continue
        try:
            argv = (d / "cmdline").read_bytes().split(b"\0")
        except OSError:
            continue
        argv = [a.decode(errors="replace") for a in argv if a]
        if matches(argv, targets):
            pids.append(pid)
    return pids


def kill_all(targets: tuple[str, ...], sig: int) -> list[int]:
    pids = scan(targets)
    for pid in pids:
        try:
            os.kill(pid, sig)
        except OSError:
            pass
    return pids


def main() -> None:
    pathlib.Path("runs/STOP").touch()  # cooperative stop for future loops
    killed = kill_all(SUPERVISORS, signal.SIGTERM)
    if killed:
        print(f"stopped supervisors: {killed}")
    time.sleep(1)
    killed = kill_all(TRAINERS, signal.SIGTERM)
    if killed:
        print(f"sent SIGTERM to trainers: {killed}")
    # give the trainer up to 60 s to finish its epoch-state save
    for _ in range(60):
        if not scan(TRAINERS):
            break
        time.sleep(1)
    for pid in kill_all(SUPERVISORS + TRAINERS, signal.SIGKILL):
        print(f"SIGKILLed {pid}")
    print("training helpers stopped")


if __name__ == "__main__":
    sys.exit(main())
