"""Native C++ host-kernel tests: build (if needed) and validate against
the numpy/scipy/jnp reference paths."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native():
    lib = os.path.join(REPO, "gpsat_tpu", "libgpsat_native.so")
    if not os.path.exists(lib):
        if shutil.which("g++") is None:
            pytest.skip("g++ not available to build the native library")
        subprocess.check_call([sys.executable, "-m", "gpsat_tpu.build_native"], cwd=REPO)
    import importlib

    import gpsat_tpu.native as nat

    importlib.reload(nat)
    assert nat.HAS_NATIVE
    return nat


class TestNative:
    def test_max_dist_bool(self, native):
        rng = np.random.default_rng(0)
        locs = rng.normal(size=(50_000, 3))
        ref = np.array([0.0, 0.1, -0.1])
        from scipy.spatial.distance import cdist

        expect = cdist(locs, ref[None, :])[:, 0] < 1.0
        np.testing.assert_array_equal(native.max_dist_bool(locs, ref, 1.0), expect)

    def test_gaussian_2d_weight(self, native):
        rng = np.random.default_rng(1)
        x, y, vals = rng.normal(size=300), rng.normal(size=300), rng.normal(size=300)
        vals[::5] = np.nan
        from gpsat_tpu.postprocess import gaussian_2d_weight as ref_g

        np.testing.assert_allclose(
            native.gaussian_2d_weight(x, y, x, y, 0.7, 1.3, vals),
            np.asarray(ref_g(x, y, x, y, 0.7, 1.3, vals)),
            rtol=1e-10,
        )

    def test_radius_query_all(self, native):
        rng = np.random.default_rng(2)
        coords = rng.uniform(0, 100, size=(100_000, 2))
        experts = rng.uniform(5, 95, size=(25, 2))
        from scipy.spatial import cKDTree

        tree = cKDTree(coords)
        expect = tree.query_ball_point(experts, 4.0)
        got = native.radius_query_all(coords, experts, 4.0)
        for a, b in zip(got, expect):
            assert set(a.tolist()) == set(b)

    def test_inverse_transforms(self, native):
        from gpsat_tpu.ops import transforms as T

        ys = np.array([1e-8, 0.1, 1.0, 50.0, 800.0])
        np.testing.assert_allclose(native.inverse_softplus(ys), np.asarray(T.inverse_softplus(ys)), rtol=1e-10)
        zs = np.linspace(0.01, 0.99, 11)
        np.testing.assert_allclose(
            native.inverse_sigmoid(zs, 0, 1), np.asarray(T.inverse_sigmoid_lh(zs, 0, 1)), rtol=1e-10
        )

    def test_prediction_locations_uses_native(self, native):
        from gpsat_tpu.data.prediction_locations import max_dist_bool

        rng = np.random.default_rng(3)
        locs = rng.normal(size=(1000, 2))
        out = max_dist_bool(locs, np.zeros(2), 1.5)
        from scipy.spatial.distance import cdist

        expect = cdist(locs, np.zeros((1, 2)))[:, 0] < 1.5
        np.testing.assert_array_equal(out, expect)


class TestRadiusBoundary:
    """Exact-boundary semantics: local_select is inclusive (d <= r, the
    reference's query_ball_point), prediction locations strict (d < r,
    the reference's _max_dist_bool) — on BOTH backends."""

    def _fixture(self):
        # expert at origin; points exactly at r, just inside, just outside
        coords = np.array([[4.0, 0.0], [0.0, -4.0], [3.9999, 0.0], [4.0001, 0.0], [1.0, 1.0]])
        experts = np.array([[0.0, 0.0]])
        return coords, experts

    def test_native_inclusive_vs_strict(self, native):
        coords, experts = self._fixture()
        inc = native.radius_query_all(coords, experts, 4.0, inclusive=True)[0]
        st = native.radius_query_all(coords, experts, 4.0, inclusive=False)[0]
        assert set(inc.tolist()) == {0, 1, 2, 4}
        assert set(st.tolist()) == {2, 4}

    def test_fallback_inclusive_vs_strict(self, native, monkeypatch):
        coords, experts = self._fixture()
        monkeypatch.setattr(native, "_lib", None)
        inc = native.radius_query_all(coords, experts, 4.0, inclusive=True)[0]
        st = native.radius_query_all(coords, experts, 4.0, inclusive=False)[0]
        assert set(inc.tolist()) == {0, 1, 2, 4}
        assert set(st.tolist()) == {2, 4}

    def test_batched_select_matches_per_expert_on_boundary(self, native):
        import pandas as pd

        from gpsat_tpu.data import select as sel

        # binned-data geometry: obs on a regular grid, expert on a bin
        # center, radius an exact multiple of the spacing
        g = np.arange(-6, 7, 1.0)
        xx, yy = np.meshgrid(g, g)
        df = pd.DataFrame({"x": xx.ravel(), "y": yy.ravel()})
        refs = pd.DataFrame({"x": [0.0], "y": [0.0]})
        ls = [{"col": ["x", "y"], "comp": "<", "val": 4.0}]
        per_expert = np.flatnonzero(sel.local_select_bool(df, refs.iloc[[0]], ls))
        batched = sel.local_select_indices_all(df, refs, ls)[0]
        np.testing.assert_array_equal(np.sort(batched), np.sort(per_expert))
        # the boundary points (±4, 0), (0, ±4) ARE included
        assert len(per_expert) == len(df[(df.x**2 + df.y**2) <= 16.0])

    def test_batched_pred_locs_match_per_expert_on_boundary(self, native):
        import pandas as pd

        from gpsat_tpu.data.prediction_locations import PredictionLocations

        g = np.arange(-6, 7, 1.0)
        xx, yy = np.meshgrid(g, g)
        df = pd.DataFrame({"x": xx.ravel(), "y": yy.ravel()})
        refs = pd.DataFrame({"x": [0.0, 1.0], "y": [0.0, 0.0]})
        pl = PredictionLocations(method="from_dataframe", df=df, max_dist=4.0, coords_col=["x", "y"])
        got = pl.batch_call(refs)
        for i in range(len(refs)):
            pl.expert_loc = refs.iloc[[i]]
            expect = pl()
            np.testing.assert_array_equal(got[i], expect)


def test_abi_gate_rejects_stale_library(tmp_path):
    """A prebuilt .so with a different (or missing) gpsat_abi_version must
    be refused — calling a v1 binary with v2 argtypes passes shifted
    pointer arguments (segfault territory)."""
    from gpsat_tpu import native

    src = tmp_path / "stale.cpp"
    src.write_text(
        '#include <cstdint>\n'
        'extern "C" int64_t gpsat_abi_version() { return 1; }\n'
    )
    so = tmp_path / "libstale.so"
    subprocess.run(
        ["g++", "-shared", "-fPIC", "-o", str(so), str(src)], check=True
    )
    with pytest.warns(UserWarning, match="ABI v1"):
        assert native._load_checked([str(so)]) is None

    # no version symbol at all == pre-versioning v1: also refused
    src2 = tmp_path / "unversioned.cpp"
    src2.write_text('extern "C" void gpsat_grid_index_free() {}\n')
    so2 = tmp_path / "libunversioned.so"
    subprocess.run(
        ["g++", "-shared", "-fPIC", "-o", str(so2), str(src2)], check=True
    )
    with pytest.warns(UserWarning, match="ABI v1"):
        assert native._load_checked([str(so2)]) is None

    # missing files are skipped silently
    assert native._load_checked([str(tmp_path / "absent.so")]) is None
