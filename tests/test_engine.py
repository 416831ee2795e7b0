"""Batched expert engine vs the serial single-expert model.

The whole TPU design rests on: a vmapped/sharded batch of padded tiles must
reproduce, expert for expert, what the reference's serial loop produces.
Here the 'reference' is our own GPRModel (itself oracle-tested against
sklearn at 1e-6 in test_gpr_oracle.py).
"""

import numpy as np
import pandas as pd
import pytest
import jax

from gpsat_tpu.models.gpr import GPRModel
from gpsat_tpu.parallel import batching
from gpsat_tpu.models.functional import make_gpr_core
from gpsat_tpu.parallel.engine import default_mesh, make_batched_runner, run_tile_batch

CORE = make_gpr_core()

rng = np.random.default_rng(7)


@pytest.fixture(scope="module")
def problem():
    # scattered obs over a [0,10]^2 domain; experts on a 3x3 grid
    Ntot = 600
    coords = rng.uniform(0, 10, size=(Ntot, 2))
    obs = np.sin(coords[:, 0]) * np.cos(coords[:, 1]) + 0.1 * rng.normal(size=Ntot)
    experts = np.stack(np.meshgrid([2.5, 5.0, 7.5], [2.5, 5.0, 7.5]), -1).reshape(-1, 2)
    radius = 3.0
    from scipy.spatial import cKDTree

    tree = cKDTree(coords)
    tile_indices = [np.array(sorted(tree.query_ball_point(e, radius))) for e in experts]
    pred_coords = [e[None, :] + np.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.5]]) for e in experts]
    return dict(coords=coords, obs=obs, experts=experts, tile_indices=tile_indices, pred_coords=pred_coords)


def serial_reference(problem, expert_ids):
    """Fit each expert with the single-expert model (serial loop analogue)."""
    out = {}
    for e in expert_ids:
        ix = problem["tile_indices"][e]
        m = GPRModel(
            coords=problem["coords"][ix],
            obs=problem["obs"][ix],
            verbose=False,
        )
        m.optimise_parameters(max_iter=500)
        pred = m.predict(problem["pred_coords"][e], apply_scale=False)
        out[e] = dict(params=m.get_parameters(), pred=pred, obj=m.get_objective_function_value())
    return out


class TestBatchedEngine:
    def test_matches_serial(self, problem):
        E = len(problem["tile_indices"])
        batches = batching.assemble_tiles(
            problem["coords"],
            problem["obs"],
            problem["tile_indices"],
            problem["pred_coords"],
        )
        runner = make_batched_runner(CORE, max_iter=500)
        ref = serial_reference(problem, range(E))

        seen = 0
        for b in batches:
            res = run_tile_batch(b, {}, runner, CORE)
            for i, e in enumerate(res["expert_index"]):
                r = ref[e]
                np.testing.assert_allclose(
                    res["lengthscales"][i], r["params"]["lengthscales"], rtol=1e-5, atol=1e-7
                )
                np.testing.assert_allclose(
                    res["kernel_variance"][i], r["params"]["kernel_variance"], rtol=1e-5
                )
                np.testing.assert_allclose(
                    res["objective"][i], r["obj"], rtol=1e-8, atol=1e-8
                )
                P = len(problem["pred_coords"][e])
                np.testing.assert_allclose(res["f_mean"][i][:P], r["pred"]["f*"], rtol=1e-6, atol=1e-9)
                np.testing.assert_allclose(res["f_var"][i][:P], r["pred"]["f*_var"], rtol=1e-6, atol=1e-9)
                np.testing.assert_allclose(res["y_var"][i][:P], r["pred"]["y_var"], rtol=1e-6, atol=1e-9)
                seen += 1
        assert seen == E

    def test_sharded_over_mesh(self, problem):
        # same results when sharded over the 8-device fake CPU mesh,
        # including dead-tile padding to make B divide the mesh
        assert len(jax.devices()) == 8
        mesh = default_mesh()
        batches = batching.assemble_tiles(
            problem["coords"],
            problem["obs"],
            problem["tile_indices"],
            problem["pred_coords"],
        )
        runner_plain = make_batched_runner(CORE, max_iter=500)
        runner_mesh = make_batched_runner(CORE, max_iter=500, mesh=mesh)
        for b in batches:
            r0 = run_tile_batch(b, {}, runner_plain, CORE)
            r1 = run_tile_batch(b, {}, runner_mesh, CORE, mesh=mesh)
            assert list(r0["expert_index"]) == list(r1["expert_index"])
            np.testing.assert_allclose(r0["lengthscales"], r1["lengthscales"], rtol=1e-9)
            np.testing.assert_allclose(r0["f_mean"], r1["f_mean"], rtol=1e-9, atol=1e-12)

    def test_bucketing(self):
        assert batching.bucket_size(1) == 128
        assert batching.bucket_size(128) == 128
        assert batching.bucket_size(129) == 256
        assert batching.bucket_size(600) == 1024

    def test_dead_tile_padding(self, problem):
        batches = batching.assemble_tiles(
            problem["coords"],
            problem["obs"],
            problem["tile_indices"][:3],
            problem["pred_coords"][:3],
        )
        b = batching.pad_batch_to(batches[0], batches[0].B + 2)
        runner = make_batched_runner(CORE, max_iter=50)
        res = run_tile_batch(b, {}, runner, CORE)
        # dead tiles stripped; all results finite
        assert len(res["expert_index"]) == 3
        assert np.isfinite(res["f_mean"]).all()
        assert np.isfinite(res["lengthscales"]).all()


class TestPolish:
    def test_f64_polish_recovers_f64_accuracy(self, problem):
        """f32 coarse pass + f64 polish must land within ~1e-5 of the pure
        f64 result on predictions (BASELINE.md north star; measured at
        ~1e-6 by bench_accuracy.py)."""
        from gpsat_tpu.parallel.batching import cast_batch
        from gpsat_tpu.parallel.engine import polish_tile_batch

        batches = batching.assemble_tiles(
            problem["coords"], problem["obs"], problem["tile_indices"][:4],
            problem["pred_coords"][:4],
        )
        assert len(batches) == 1
        b64 = batches[0]
        core = make_gpr_core(jitter=0.0)
        gold_runner = make_batched_runner(core, max_iter=300, linesearch="zoom")
        gold = run_tile_batch(b64, {"likelihood_variance": 0.1}, gold_runner, core)

        b32 = cast_batch(b64, np.float32)
        core32 = make_gpr_core(jitter=1e-5)
        coarse_runner = make_batched_runner(core32, max_iter=150)
        coarse = run_tile_batch(b32, {"likelihood_variance": 0.1}, coarse_runner, core32)

        polished = polish_tile_batch(b64, coarse, core, max_iter=150)  # production default depth
        live = gold["pred_mask"] > 0  # compare live prediction slots only
        gap_coarse = np.max(np.abs((coarse["f_mean"] - gold["f_mean"])[live]))
        gap_polished = np.max(np.abs((polished["f_mean"] - gold["f_mean"])[live]))
        assert gap_polished < 1e-5
        assert gap_polished < gap_coarse
        assert np.max(np.abs((polished["f_var"] - gold["f_var"])[live])) < 1e-5


class TestTwoStage:
    def test_compaction_matches_single_stage(self, problem):
        """Two-stage (head budget + compacted tail) must reach the same
        optima/predictions as one full run."""
        from gpsat_tpu.parallel.engine import run_tile_batch_two_stage

        batches = batching.assemble_tiles(
            problem["coords"], problem["obs"], problem["tile_indices"][:6],
            problem["pred_coords"][:6],
        )
        assert len(batches) == 1
        b = batches[0]
        core = make_gpr_core(jitter=0.0)
        full = make_batched_runner(core, max_iter=300)
        gold = run_tile_batch(b, {"likelihood_variance": 0.1}, full, core)
        assert gold["converged"].all()

        head = make_batched_runner(core, max_iter=5)  # too few to converge
        two = run_tile_batch_two_stage(
            b, {"likelihood_variance": 0.1}, head, full, core
        )
        assert two["converged"].all()
        assert (two["num_iter"] >= gold["num_iter"].min()).any()
        live = gold["pred_mask"] > 0
        np.testing.assert_allclose(
            two["f_mean"][live], gold["f_mean"][live], atol=1e-6
        )
        np.testing.assert_allclose(
            two["objective"], gold["objective"], rtol=1e-9, atol=1e-8
        )


def test_pad_multiple_matches_pow2_padding(problem):
    """pad_multiple=<k> (fewer dead lanes for recurring fixed-size buckets)
    must produce identical results to the pow2 default."""
    batches = batching.assemble_tiles(
        problem["coords"], problem["obs"], problem["tile_indices"][:5],
        problem["pred_coords"][:5],
    )
    b = batches[0]
    core = make_gpr_core(jitter=0.0)
    runner = make_batched_runner(core, max_iter=200)
    r_pow2 = run_tile_batch(b, {"likelihood_variance": 0.1}, runner, core)
    r_mult = run_tile_batch(b, {"likelihood_variance": 0.1}, runner, core, pad_multiple=5)
    np.testing.assert_allclose(r_pow2["f_mean"], r_mult["f_mean"], rtol=1e-12)
    np.testing.assert_allclose(r_pow2["lengthscales"], r_mult["lengthscales"], rtol=1e-12)


def test_memory_size_plumbs_through(problem):
    """optim memory_size (scipy L-BFGS-B 'maxcor' analogue): different
    history lengths must land on the same optimum (it changes the path,
    not the destination), and the carry state must round-trip with a
    non-default m."""
    from gpsat_tpu.parallel.engine import run_tile_batch_carry

    batches = batching.assemble_tiles(
        problem["coords"], problem["obs"], problem["tile_indices"][:4],
        problem["pred_coords"][:4],
    )
    b = batches[0]
    core = make_gpr_core(jitter=0.0)
    r10 = run_tile_batch(
        b, {"likelihood_variance": 0.1},
        make_batched_runner(core, max_iter=400, linesearch="single_eval"), core,
    )
    r3 = run_tile_batch(
        b, {"likelihood_variance": 0.1},
        make_batched_runner(core, max_iter=400, linesearch="single_eval", memory_size=3),
        core,
    )
    assert r10["converged"].all() and r3["converged"].all()
    np.testing.assert_allclose(r10["objective"], r3["objective"], rtol=1e-8)
    np.testing.assert_allclose(r10["lengthscales"], r3["lengthscales"], rtol=1e-4)

    head = make_batched_runner(
        core, max_iter=6, linesearch="single_eval", memory_size=3, return_state=True
    )
    tail = make_batched_runner(
        core, max_iter=400, linesearch="single_eval", memory_size=3,
        take_state=True, return_state=True,
    )
    carry = run_tile_batch_carry(b, {"likelihood_variance": 0.1}, head, tail, core)
    np.testing.assert_array_equal(r3["num_iter"], carry["num_iter"])
    np.testing.assert_allclose(r3["objective"], carry["objective"], rtol=1e-12)


class TestCarryCompaction:
    def test_state_carry_exactly_matches_single_run(self, problem):
        """run_tile_batch_carry: head + resumed compacted tail must equal a
        single full run BIT-EXACTLY (iteration counts and results) — the
        L-BFGS carry round-trips with no history restart."""
        from gpsat_tpu.parallel.engine import run_tile_batch_carry

        batches = batching.assemble_tiles(
            problem["coords"], problem["obs"], problem["tile_indices"][:6],
            problem["pred_coords"][:6],
        )
        b = batches[0]
        core = make_gpr_core(jitter=0.0)
        full = make_batched_runner(core, max_iter=400, linesearch="single_eval")
        gold = run_tile_batch(b, {"likelihood_variance": 0.1}, full, core)
        assert gold["converged"].all()

        head = make_batched_runner(core, max_iter=6, linesearch="single_eval", return_state=True)
        tail = make_batched_runner(
            core, max_iter=400, linesearch="single_eval", take_state=True, return_state=True
        )
        carry = run_tile_batch_carry(b, {"likelihood_variance": 0.1}, head, tail, core)
        np.testing.assert_array_equal(gold["num_iter"], carry["num_iter"])
        np.testing.assert_allclose(gold["f_mean"], carry["f_mean"], rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(gold["objective"], carry["objective"], rtol=1e-12)
        np.testing.assert_allclose(gold["lengthscales"], carry["lengthscales"], rtol=1e-12)

    def test_all_converged_in_head_short_circuits(self, problem):
        from gpsat_tpu.parallel.engine import run_tile_batch_carry

        batches = batching.assemble_tiles(
            problem["coords"], problem["obs"], problem["tile_indices"][:3],
            problem["pred_coords"][:3],
        )
        b = batches[0]
        core = make_gpr_core(jitter=0.0)
        head = make_batched_runner(core, max_iter=400, linesearch="single_eval", return_state=True)
        tail = make_batched_runner(
            core, max_iter=400, linesearch="single_eval", take_state=True, return_state=True
        )
        res = run_tile_batch_carry(b, {"likelihood_variance": 0.1}, head, tail, core)
        assert res["converged"].all()
        assert "opt_state" not in res


class TestAutoBatchCap:
    """HBM-aware split of dense large-tile buckets (batching.auto_batch_cap)."""

    def _problem(self, n_experts=20, n_obs=200, seed=0):
        rng = np.random.default_rng(seed)
        coords = rng.uniform(-1, 1, size=(n_experts * n_obs, 2))
        obs = rng.normal(size=len(coords))
        tiles = [np.arange(e * n_obs, (e + 1) * n_obs) for e in range(n_experts)]
        preds = [coords[t[:1]] for t in tiles]
        return coords, obs, tiles, preds

    def test_default_budget_leaves_canonical_buckets_alone(self):
        # N=512 tiles must not split under the default budget (the bench
        # runs B=512 there, measured on-chip)
        assert batching.auto_batch_cap(512) >= 512
        # large tiles do get a cap well under a pipeline-sized expert count
        assert 1 <= batching.auto_batch_cap(4096) < 64

    def test_bucket_splits_under_budget(self, monkeypatch):
        coords, obs, tiles, preds = self._problem()
        # 200-obs tiles -> Nmax=256; cap = 0.02e9/(8*256^2*4) = 9 experts
        monkeypatch.setenv("GPSAT_HBM_BUDGET_GB", "0.02")
        batches = batching.assemble_tiles(coords, obs, tiles, preds, memory_cap=True)
        assert [b.B for b in batches] == [9, 9, 2]
        assert all(b.Nmax == 256 for b in batches)
        # every expert lands exactly once
        got = np.sort(np.concatenate([b.expert_index for b in batches]))
        np.testing.assert_array_equal(got, np.arange(20))

    def test_off_by_default_for_sparse_cores(self, monkeypatch):
        # chunked/sparse cores (SGPR large-N) assemble without the cap
        coords, obs, tiles, preds = self._problem()
        monkeypatch.setenv("GPSAT_HBM_BUDGET_GB", "0.02")
        batches = batching.assemble_tiles(coords, obs, tiles, preds)
        assert [b.B for b in batches] == [20]

    def test_disable_flag_restores_single_bucket(self, monkeypatch):
        coords, obs, tiles, preds = self._problem()
        monkeypatch.setenv("GPSAT_HBM_BUDGET_GB", "0.02")
        monkeypatch.setenv("GPSAT_AUTO_BATCH_CAP", "0")
        batches = batching.assemble_tiles(coords, obs, tiles, preds, memory_cap=True)
        assert [b.B for b in batches] == [20]

    def test_explicit_max_batch_size_wins_when_tighter(self, monkeypatch):
        coords, obs, tiles, preds = self._problem()
        monkeypatch.setenv("GPSAT_HBM_BUDGET_GB", "0.02")
        batches = batching.assemble_tiles(coords, obs, tiles, preds, max_batch_size=4, memory_cap=True)
        assert [b.B for b in batches] == [4, 4, 4, 4, 4]


class TestCoalesceBuckets:
    """GPSAT_COALESCE_BUCKETS: pad everything to one (Nmax, Pmax) so the
    sweep dispatches in the fewest relay round trips (link-bound regime,
    BENCH_PIPELINE_r05.json attribution)."""

    def _ragged(self, seed=3):
        rng = np.random.default_rng(seed)
        # two size groups straddling the 128 bucket edge: 100-obs and
        # 200-obs tiles -> default buckets Nmax 128 and 256
        sizes = [100, 100, 100, 200, 200, 200]
        coords = rng.uniform(-1, 1, size=(sum(sizes), 2))
        # vary in BOTH dims so lengthscales are identified (an unidentified
        # direction amplifies benign reduction-order noise unboundedly)
        obs = np.sin(3 * coords[:, 0]) * np.cos(3 * coords[:, 1]) + 0.1 * rng.normal(size=len(coords))
        tiles, off = [], 0
        for s in sizes:
            tiles.append(np.arange(off, off + s))
            off += s
        # ragged prediction counts too (pmax multiple is 8)
        preds = [coords[t[: 3 + (i % 2) * 10]] for i, t in enumerate(tiles)]
        return coords, obs, tiles, preds

    def test_single_program_shape(self):
        coords, obs, tiles, preds = self._ragged()
        default = batching.assemble_tiles(coords, obs, tiles, preds)
        assert sorted(b.Nmax for b in default) == [128, 256]
        one = batching.assemble_tiles(coords, obs, tiles, preds, coalesce=True)
        assert len(one) == 1 and one[0].Nmax == 256 and one[0].Pmax == 16
        got = np.sort(one[0].expert_index)
        np.testing.assert_array_equal(got, np.arange(6))

    def test_env_knob(self, monkeypatch):
        coords, obs, tiles, preds = self._ragged()
        monkeypatch.setenv("GPSAT_COALESCE_BUCKETS", "1")
        batches = batching.assemble_tiles(coords, obs, tiles, preds)
        assert len(batches) == 1 and batches[0].Nmax == 256

    def test_hbm_split_shares_shape(self, monkeypatch):
        # the HBM cap may still split the batch, but every split must keep
        # the one global (Nmax, Pmax) so they share a compiled program
        coords, obs, tiles, preds = self._ragged()
        monkeypatch.setenv("GPSAT_HBM_BUDGET_GB", "0.008")
        # cap at Nmax=256: 0.008e9/(8*256^2*4) = 3 experts per program
        batches = batching.assemble_tiles(
            coords, obs, tiles, preds, coalesce=True, memory_cap=True
        )
        assert len(batches) == 2
        assert all(b.Nmax == 256 and b.Pmax == 16 for b in batches)
        got = np.sort(np.concatenate([b.expert_index for b in batches]))
        np.testing.assert_array_equal(got, np.arange(6))

    def test_numerically_identical(self):
        # padding 100-obs tiles out to Nmax=256 must not change any result
        # (mask_gram padding invariance, end to end through the engine)
        coords, obs, tiles, preds = self._ragged()
        runner = make_batched_runner(CORE, max_iter=300)

        def collect(batches):
            out = {}
            for b in batches:
                res = run_tile_batch(b, {}, runner, CORE)
                for i, e in enumerate(res["expert_index"]):
                    P = len(preds[e])
                    out[int(e)] = (
                        np.asarray(res["lengthscales"][i]),
                        np.asarray(res["objective"][i]),
                        np.asarray(res["f_mean"][i][:P]),
                    )
            return out

        a = collect(batching.assemble_tiles(coords, obs, tiles, preds))
        b = collect(batching.assemble_tiles(coords, obs, tiles, preds, coalesce=True))
        assert a.keys() == b.keys()
        # padding to a wider Nmax changes XLA reduction order, so allow
        # f64 roundoff through the optimizer trajectory — not bit equality
        for e in a:
            # hyper optima wander a hair more than the objective/predictions
            # (roundoff enters the L-BFGS trajectory, not just the final eval)
            np.testing.assert_allclose(a[e][0], b[e][0], rtol=1e-4, atol=1e-8)
            np.testing.assert_allclose(a[e][1], b[e][1], rtol=1e-8, atol=1e-10)
            np.testing.assert_allclose(a[e][2], b[e][2], rtol=1e-5, atol=1e-7)
