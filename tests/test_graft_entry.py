"""The driver contract: entry() must jit-compile and dryrun_multichip
must execute real dp+tp shardings on a virtual mesh."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    P, nume, deno = out
    assert P.shape == args[0].shape
    assert float(deno) > 0


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_non_power_of_two():
    """Mesh sizes that don't divide the tables evenly (padding on
    uneven splits) must still compile and run — pins the 6-device case
    verified manually on the virtual CPU mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(6)
