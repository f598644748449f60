"""Driver-contract smoke tests for __graft_entry__.py.

The round driver (a) compile-checks ``entry()`` single-chip and (b)
executes ``dryrun_multichip(n)`` on an n-device virtual CPU platform.
Both must keep working across refactors — this module runs them under
the suite's 8-device CPU platform (conftest) so a break is caught in
CI instead of at round end.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None
    pred_hr, total, pred_lr = compiled(*args)
    assert float(total) == float(total)  # finite-ish: not NaN check below
    import numpy as np
    assert np.isfinite(float(total))
    assert pred_hr.shape[0] == 1 and pred_lr.shape[0] == 1


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    ge.dryrun_multichip(8)  # raises / asserts internally on any failure
