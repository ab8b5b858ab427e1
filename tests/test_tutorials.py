"""Tutorial smoke tests — every example in ``examples/`` runs end-to-end at
reduced size.

The reference's broadest test layer is building (and thereby
type-checking) every tutorial in ``examples/`` as part of CI (SURVEY.md §5
"build-everything-as-test"); the runtime analog here is running each one.
Dataset sizes are clamped by monkeypatching the world factories BEFORE the
tutorial module is imported (tutorials bind them at import time), keeping
the suite fast while exercising the tutorials' real code paths.
"""

import importlib
import pathlib
import sys

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parents[1] / "examples"
TUTORIALS = sorted(p.stem for p in EXAMPLES_DIR.glob("tutorial_*.py"))


def _clamped(fn, max_kfs=40, max_lms=80):
    def wrapper(*args, **kw):
        if "num_kfs" in kw:
            kw["num_kfs"] = min(int(kw["num_kfs"]), max_kfs)
        if "num_landmarks" in kw:
            kw["num_landmarks"] = min(int(kw["num_landmarks"]), max_lms)
        return fn(*args, **kw)
    return wrapper


@pytest.mark.parametrize("name", TUTORIALS)
def test_tutorial_runs(name, monkeypatch):
    import srba_tpu.utils.datasets as D

    for factory in ("make_world_loop_2d", "make_world_loop_3d",
                    "make_world_loop_3d_large"):
        monkeypatch.setattr(D, factory, _clamped(getattr(D, factory)))

    sys.path.insert(0, str(EXAMPLES_DIR))
    try:
        mod = importlib.import_module(name)
        mod = importlib.reload(mod)   # re-bind the clamped factories
        assert hasattr(mod, "main"), f"{name} has no main()"
        mod.main()
    finally:
        sys.path.remove(str(EXAMPLES_DIR))
        sys.modules.pop(name, None)
