"""Driver contract: __graft_entry__ entry() and dryrun_multichip().

entry() is validated by tracing (jax.eval_shape — no 87M-param CPU
forward in the suite); dryrun runs for real on the 8-device test mesh.
"""

import jax
import numpy as np


def test_entry_traces():
    import __graft_entry__ as G

    fn, args = G.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (16, 512)


def test_dryrun_multichip_on_test_mesh(capsys):
    import __graft_entry__ as G

    G.dryrun_multichip(8)  # conftest provides the 8 virtual CPU devices
    assert "dryrun_multichip ok" in capsys.readouterr().out


def test_bench_contract_shape():
    """bench.py must print one JSON line with the driver's keys (checked
    statically — the TPU run belongs to the driver)."""
    import ast
    from pathlib import Path

    src = (Path(__file__).parent.parent / "bench.py").read_text()
    tree = ast.parse(src)  # syntactically valid
    for key in ('"metric"', '"value"', '"unit"', '"vs_baseline"'):
        assert key in src, key
    assert "json.dumps(result)" in src
