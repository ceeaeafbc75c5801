"""stop_training's argv matcher must hit helper processes and never a shell
-c wrapper that merely mentions the script names (the reason pkill -f is
banned here)."""

import importlib.util
import pathlib

spec = importlib.util.spec_from_file_location(
    "stop_training",
    pathlib.Path(__file__).resolve().parents[1] / "scripts" / "stop_training.py")
stop_training = importlib.util.module_from_spec(spec)
spec.loader.exec_module(stop_training)

SUP = stop_training.SUPERVISORS
TRAIN = stop_training.TRAINERS


def test_matches_helper_invocations():
    assert stop_training.matches(
        ["bash", "scripts/train_supervised.sh", "--epochs", "100"], SUP)
    assert stop_training.matches(
        ["/bin/bash", "/root/repo/scripts/checkpoint_commit.sh"], SUP)
    assert stop_training.matches(
        ["python", "scripts/train_model.py", "--out", "runs/x"], TRAIN)
    assert stop_training.matches(
        ["python3", "/root/repo/scripts/train_model.py"], TRAIN)


def test_never_matches_shell_wrappers_or_mentions():
    # A -c wrapper whose command STRING mentions the scripts: pkill -f would
    # kill this; the argv matcher must not.
    assert not stop_training.matches(
        ["/bin/bash", "-c", "bash scripts/train_supervised.sh; "
         "python scripts/train_model.py"], SUP + TRAIN)
    # An editor/pager on the script file.
    assert not stop_training.matches(["claude", "scripts/train_model.py"],
                                     TRAIN)
    # tee/tail and bare interpreters.
    assert not stop_training.matches(["tail", "-f", "runs/chain.log"], SUP)
    assert not stop_training.matches(["python"], TRAIN)
    assert not stop_training.matches([], TRAIN)


def test_matches_versioned_interpreter_and_flags():
    """ADVICE r3: a trainer launched as 'python3.12 -u train_model.py' must
    be parked — versioned interpreters and option flags cannot hide it."""
    assert stop_training.matches(
        ["/usr/bin/python3.12", "-u", "scripts/train_model.py"], TRAIN)
    assert stop_training.matches(
        ["python3", "-u", "-B", "scripts/train_supervised.sh"], SUP)
    # -c command-string mode is code, never a script path.
    assert not stop_training.matches(
        ["python3.12", "-c", "print('train_model.py')"], TRAIN)


def test_argument_taking_flags_are_skipped():
    """ADVICE r4: -W/-X take a SEPARATE argument; the old first-non-flag
    heuristic picked 'ignore' as the script and the trainer evaded parking."""
    assert stop_training.matches(
        ["python", "-W", "ignore", "scripts/train_model.py"], TRAIN)
    assert stop_training.matches(
        ["python3.12", "-X", "dev", "-W", "error", "scripts/train_model.py"],
        TRAIN)
    # Attached forms still work via the generic dash skip.
    assert stop_training.matches(
        ["python", "-Wignore", "scripts/train_model.py"], TRAIN)
    # The flag's argument must never be mistaken for a script even when it
    # IS a target name (perverse but possible: -W train_model.py).
    assert not stop_training.matches(
        ["python", "-W", "train_model.py"], TRAIN)


def test_module_launches_match():
    """ADVICE r4: 'python -m scripts.train_model' must be parked too."""
    assert stop_training.matches(
        ["python", "-m", "scripts.train_model", "--out", "runs/x"], TRAIN)
    assert stop_training.matches(["python3.12", "-u", "-m", "train_model"],
                                 TRAIN)
    assert not stop_training.matches(["python", "-m", "pytest", "tests"],
                                     TRAIN)
    assert not stop_training.matches(["python", "-m"], TRAIN)
    # bash -m is the job-control flag (no argument): the script after it
    # must still match, and never be treated as a module name.
    assert stop_training.matches(
        ["bash", "-m", "scripts/train_supervised.sh"], SUP)


def test_double_dash_and_bash_option_args():
    assert stop_training.matches(
        ["python", "--", "scripts/train_model.py"], TRAIN)
    assert stop_training.matches(
        ["bash", "-o", "pipefail", "scripts/train_supervised.sh"], SUP)
    assert not stop_training.matches(
        ["bash", "-o", "train_supervised.sh"], SUP)
