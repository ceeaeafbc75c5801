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


# Interpreter flags whose ARGUMENT is the next argv element. Without
# skipping these, "python -W ignore scripts/train_model.py" would pick
# "ignore" as the script and the trainer would evade parking (ADVICE r4).
_PY_ARG_FLAGS = ("-W", "-X", "--check-hash-based-pycs")
_SH_ARG_FLAGS = ("-o", "+o", "-O", "+O")


def script_of(argv: list[str]) -> str | None:
    """The script a direct interpreter launch will run, or None.

    None for command-string launches (-c: the next argv is CODE and may
    mention any script name — e.g. the orchestration session driving this
    repo — so it must never match) and for non-interpreter argv[0]s.
    `python -m pkg.mod` launches return "<mod>.py" so basename matching
    against *.py targets covers module-mode trainers too (ADVICE r4).
    """
    if len(argv) < 2:
        return None
    interp = os.path.basename(argv[0])
    # Versioned interpreters (python3.12) and option flags (-u) count too —
    # mirrors chipquiet.py's detection (ADVICE r3): a trainer launched as
    # "python3.12 -u train_model.py" must be parked, not just stamped.
    is_py = interp.startswith("python")
    if not is_py and interp not in ("bash", "sh"):
        return None
    arg_flags = _PY_ARG_FLAGS if is_py else _SH_ARG_FLAGS
    i = 1
    while i < len(argv):
        a = argv[i]
        if a == "-c":
            return None
        if is_py and a == "-m":
            mod = argv[i + 1] if i + 1 < len(argv) else ""
            if not mod or any(ch in mod for ch in " ;\n"):
                return None
            return mod.split(".")[-1] + ".py"
        if a == "--":
            i += 1
            break
        if a in arg_flags:
            i += 2
            continue
        if a.startswith("-") or (not is_py and a.startswith("+")):
            i += 1
            continue
        break
    script = argv[i] if i < len(argv) else ""
    if any(ch in script for ch in " ;\n"):
        return None  # a command string, not a path
    return script or None


def matches(argv: list[str], targets: tuple[str, ...]) -> bool:
    script = script_of(argv)
    # Exact basename equality, not endswith: an unrelated script with a
    # suffix-matching name (my_train_model.py) must not be killed (ADVICE r2).
    return script is not None and os.path.basename(script) in targets


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
