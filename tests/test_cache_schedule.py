"""Refresh-schedule construction + the scheduled (non-uniform) cached sampler.

Covers `stedm_tpu/core/cache_schedule.py` (placement math, pure numpy) and the
non-uniform serving-mode trajectory equivalences:

* scheduled sampler at uniform positions == interval sampler (same math),
* host-block drive == scanned drive for a non-uniform schedule,
* DP-optimal placement beats uniform under its own cost model and is exact vs
  brute force on small instances,
* drift calibration runs and feeds the DP end-to-end on a tiny model.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stedm_tpu.core.cache_schedule import (
    optimal_positions,
    quad_center_positions,
    schedule_cost,
    uniform_positions,
    validate_positions,
)


class TestPlacement:
    def test_uniform(self):
        assert uniform_positions(10, 3) == (0, 3, 6, 9)
        assert uniform_positions(6, 1) == (0, 1, 2, 3, 4, 5)

    def test_validate_rejects(self):
        with pytest.raises(ValueError):
            validate_positions([1, 4], 10)       # missing mandatory 0
        with pytest.raises(ValueError):
            validate_positions([0, 10], 10)      # out of range
        with pytest.raises(ValueError):
            validate_positions([], 10)

    def test_quad_center_count_and_bounds(self):
        for n in (3, 7, 10, 17):
            pos = quad_center_positions(50, n)
            assert len(pos) == n
            assert pos[0] == 0 and pos[-1] < 50
            assert list(pos) == sorted(set(pos))

    def test_quad_center_is_densest_near_center(self):
        pos = np.asarray(quad_center_positions(50, 9, center=0.4, power=2.0))
        gaps = np.diff(pos)
        c = 0.4 * 49
        # the gap straddling the center is no larger than the edge gaps
        mid = int(np.argmin(np.abs((pos[:-1] + pos[1:]) / 2 - c)))
        assert gaps[mid] <= gaps[0] and gaps[mid] <= gaps[-1]

    def test_schedule_cost_matches_direct_simulation(self):
        rng = np.random.default_rng(0)
        drift = rng.uniform(0.1, 1.0, 11)
        pos = (0, 4, 7)
        # direct simulation of accumulated staleness
        cost = 0.0
        acc = 0.0
        for k in range(12):
            if k in pos:
                acc = 0.0
            else:
                acc += drift[k - 1]
                cost += acc
        assert schedule_cost(pos, drift) == pytest.approx(cost)

    def test_optimal_matches_bruteforce(self):
        rng = np.random.default_rng(1)
        for trial in range(5):
            S, R = 9, 3
            drift = rng.uniform(0.0, 1.0, S - 1)
            best = min(
                ((0,) + c for c in itertools.combinations(range(1, S), R - 1)),
                key=lambda p: schedule_cost(p, drift))
            got = optimal_positions(drift, R)
            assert schedule_cost(got, drift) == pytest.approx(
                schedule_cost(best, drift))

    def test_optimal_beats_uniform_on_skewed_drift(self):
        # drift concentrated early: uniform wastes refreshes on the flat tail
        drift = np.concatenate([np.full(10, 1.0), np.full(39, 0.01)])
        uni = uniform_positions(50, 5)
        opt = optimal_positions(drift, len(uni))
        assert schedule_cost(opt, drift) < 0.6 * schedule_cost(uni, drift)

    def test_optimal_flat_drift_is_near_uniform(self):
        drift = np.ones(49)
        opt = optimal_positions(drift, 10)
        gaps = np.diff(list(opt) + [50])
        assert gaps.max() - gaps.min() <= 1

    def test_coalesce_blocks_respects_budget(self):
        from stedm_tpu.core.cache_schedule import coalesce_blocks

        pos = (0, 5, 10, 14, 18, 22, 27, 32, 37, 43)
        starts = coalesce_blocks(pos, 50, budget=10)
        assert starts[0] == 0 and set(starts) <= set(pos)
        sizes = np.diff(list(starts) + [50])
        assert sizes.max() <= 10 and sizes.sum() == 50
        # coalescing actually merges periods (fewer dispatches than refreshes)
        assert len(starts) < len(pos)

    def test_coalesce_blocks_edge_cases(self):
        from stedm_tpu.core.cache_schedule import coalesce_blocks

        # budget 1: every period its own block
        assert coalesce_blocks((0, 2, 5), 8, 1) == [0, 2, 5]
        # budget >= num_steps: one block
        assert coalesce_blocks((0, 2, 5), 8, 8) == [0]
        # a period longer than the budget becomes its own oversized block
        assert coalesce_blocks((0, 1, 9), 12, 3) == [0, 1, 9]
        with pytest.raises(ValueError):
            coalesce_blocks((0, 2), 8, 0)


@pytest.fixture(scope="module")
def tiny():
    from stedm_tpu.core.schedules import DiffusionSchedule
    from stedm_tpu.models.stedm import STEDM

    patch = 32
    model = STEDM(
        unet_config=dict(in_channels=6, out_channels=3, model_channels=32,
                         num_res_blocks=1, channel_mult=(1, 4, 8), num_heads=4,
                         attention_resolutions=(32, 16, 8)),
        first_stage_config=dict(embed_dim=3, n_embed=64, ddconfig=dict(
            double_z=False, z_channels=3, resolution=patch, in_channels=3,
            out_ch=3, ch=32, ch_mult=[1, 2, 4], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0)),
        cond_stage_config=dict(n_stages=2, in_channels=2, out_channels=3),
        style_agg="mean",
        style_sampling="nearby",
        patch_size=patch,
        dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    b = 2
    batch = {
        "segmentation": jnp.zeros((b, patch, patch, 2)).at[..., 0].set(1.0),
        "style_imgs": jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (b, 1, patch, patch, 3)),
            jnp.float32),
    }
    params = model.init(rng, jnp.zeros((b, patch, patch, 3)),
                        batch["segmentation"], batch["style_imgs"],
                        jnp.zeros((b,), jnp.int32))["params"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params)
    from stedm_tpu.core.schedules import DiffusionSchedule as DS

    schedule = DS.create("linear", 1000, 0.0015, 0.0205)
    return model, schedule, params, batch


BASE = dict(ddim_steps=12, eta=0.0, cfg_scale=1.5, rescale_phi=0.7,
            batched_cfg=True, downsample=4)
# the reference's ragged uniform stride runs 13 actual steps for ddim_steps=12
# (+1-shift, reference util.py:46-60) — schedules must size to the REAL count
N_STEPS = 13


def _actual_steps(schedule):
    from stedm_tpu.core.ddim import DDIMParams

    return DDIMParams.create(schedule, BASE["ddim_steps"], 0.0).num_steps


class TestScheduledSampler:
    def test_ragged_step_count(self, tiny):
        assert _actual_steps(tiny[1]) == N_STEPS

    def test_uniform_schedule_equals_interval(self, tiny):
        """cache_schedule at the interval's own positions reproduces
        cache_interval (same refreshes incl. the padded-tail block start)."""
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        rng = jax.random.PRNGKey(7)
        by_interval = jax.jit(make_sample_fn(
            model, schedule, SamplerConfig(cache_interval=3, **BASE)))(
                params, batch, rng)
        by_schedule = jax.jit(make_sample_fn(
            model, schedule,
            SamplerConfig(cache_schedule=uniform_positions(N_STEPS, 3),
                          **BASE)))(params, batch, rng)
        np.testing.assert_allclose(np.asarray(by_interval),
                                   np.asarray(by_schedule), atol=2e-5)

    def test_schedule_all_steps_equals_exact(self, tiny):
        """Refreshing every step == the exact (uncached) trajectory."""
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        rng = jax.random.PRNGKey(3)
        exact = jax.jit(make_sample_fn(model, schedule, SamplerConfig(**BASE)))(
            params, batch, rng)
        every = jax.jit(make_sample_fn(
            model, schedule,
            SamplerConfig(cache_schedule=tuple(range(N_STEPS)), **BASE)))(
                params, batch, rng)
        np.testing.assert_allclose(np.asarray(exact), np.asarray(every),
                                   atol=2e-5)

    def test_early_refresh_placement_is_load_bearing(self, tiny):
        """Guards the equality tests' teeth: moving an EARLY refresh by one
        step must change the output far beyond the comparison tolerance
        (late-step placement is insensitive on a converged trajectory, so
        only an early-step probe can prove the flags are actually consumed)."""
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        rng = jax.random.PRNGKey(7)
        a = jax.jit(make_sample_fn(
            model, schedule,
            SamplerConfig(cache_schedule=(0, 3, 6, 9), **BASE)))(
                params, batch, rng)
        b = jax.jit(make_sample_fn(
            model, schedule,
            SamplerConfig(cache_schedule=(0, 4, 6, 9), **BASE)))(
                params, batch, rng)
        assert float(jnp.abs(a - b).max()) > 1e-2

    @pytest.mark.parametrize("positions", [(0, 2, 5, 6, 10), (0, 1, 2, 7)])
    def test_host_blocks_match_scan(self, tiny, positions):
        from stedm_tpu.train.host_sampler import make_host_sample_fn
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        cfg = SamplerConfig(cache_schedule=positions, **BASE)
        rng = jax.random.PRNGKey(11)
        scan = jax.jit(make_sample_fn(model, schedule, cfg))(params, batch, rng)
        host = make_host_sample_fn(model, schedule, cfg)(params, batch, rng)
        np.testing.assert_allclose(np.asarray(scan), np.asarray(host),
                                   atol=2e-5)

    def test_scheduled_stochastic_matches_host(self, tiny):
        """eta > 0 threads the same per-step key sequence through both drives."""
        from stedm_tpu.train.host_sampler import make_host_sample_fn
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        cfg = SamplerConfig(cache_schedule=(0, 3, 5, 9),
                            **{**BASE, "eta": 0.3})
        rng = jax.random.PRNGKey(13)
        scan = jax.jit(make_sample_fn(model, schedule, cfg))(params, batch, rng)
        host = make_host_sample_fn(model, schedule, cfg)(params, batch, rng)
        np.testing.assert_allclose(np.asarray(scan), np.asarray(host),
                                   atol=2e-5)

    def test_schedule_validation(self, tiny):
        from stedm_tpu.train.steps import SamplerConfig, make_sample_fn

        model, schedule, params, batch = tiny
        with pytest.raises(ValueError):
            jax.jit(make_sample_fn(
                model, schedule, SamplerConfig(cache_schedule=(1, 5), **BASE)))(
                    params, batch, jax.random.PRNGKey(0))


class TestCalibration:
    def test_drift_profile_feeds_dp(self, tiny):
        from stedm_tpu.train.calibrate import measure_cache_drift
        from stedm_tpu.train.steps import SamplerConfig

        model, schedule, params, batch = tiny
        cfg = SamplerConfig(**BASE)
        drift = measure_cache_drift(model, schedule, cfg, params, batch,
                                    jax.random.PRNGKey(0))
        assert drift.shape == (N_STEPS - 1,)
        assert np.all(np.isfinite(drift)) and np.all(drift >= 0)
        pos = optimal_positions(drift, 5)
        assert len(pos) == 5 and pos[0] == 0
        # same refresh count as uniform interval-3 (ceil(13/3) = 5)
        assert schedule_cost(pos, drift) <= schedule_cost(
            uniform_positions(N_STEPS, 3), drift) + 1e-12
