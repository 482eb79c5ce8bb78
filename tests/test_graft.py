"""Driver entry points must keep compiling and running on the CPU mesh."""
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    for key in ("d1_sse_l", "d2_sse_l", "c_sse_l", "self_min"):
        assert np.all(np.isfinite(np.asarray(out[key]))), key


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    # heavy=False: the 65k routing/escalation gate already runs in the
    # 8-device test; re-compiling it for a 2-wide ring adds minutes of
    # suite time without new coverage.
    graft.dryrun_multichip(2, heavy=False)
