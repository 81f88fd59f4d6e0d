"""Keep the driver entry points green: entry() compiles and runs; the
multi-chip dry run executes a full dp-sharded training step."""

import sys

import numpy as np
import jax


sys.path.insert(0, ".")


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    e, f = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(e)).all()
    assert f.shape[1] == 3


def test_dryrun_multichip_small():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)
