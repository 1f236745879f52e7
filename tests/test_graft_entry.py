"""Driver entry points stay callable (the harness compile-checks these)."""
import jax


def test_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.device_get(fn(*args))
    assert int(out["unique"].sum()) >= 56  # 64 sim reads, sub_rate 0.02


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)
