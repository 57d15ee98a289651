import sys
from pathlib import Path

import numpy as np
import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    state, out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out.pose)).all()
    # second call: full odometry branch
    state2, out2 = jax.jit(fn)(state, *args[1:])
    assert np.isfinite(np.asarray(out2.pose)).all()
    assert int(state2.seq) == 2


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_2():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)
