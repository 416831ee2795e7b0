

def test_stack_param_lanes_mixed_success():
    """Failed host-lane getters (0-d NaN placeholders) among [D]-shaped
    successes must NaN-fill, not raise on ragged np.stack — including
    when the FIRST lane is the failed one."""
    import numpy as np

    from gpsat_tpu.experts import _stack_param_lanes

    out = _stack_param_lanes([np.asarray(np.nan), np.array([1.0, 2.0]), np.array([3.0, 4.0])])
    assert out.shape == (3, 2)
    assert np.isnan(out[0]).all()
    np.testing.assert_array_equal(out[1], [1.0, 2.0])

    # all-scalar parameters keep the [B] shape
    out = _stack_param_lanes([np.asarray(1.0), np.asarray(np.nan)])
    assert out.shape == (2,)
    # all-array, no failures: plain stack
    out = _stack_param_lanes([np.array([1.0]), np.array([2.0])])
    assert out.shape == (2, 1)
