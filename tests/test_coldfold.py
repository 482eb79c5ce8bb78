"""The one-dispatch cold-pair fold equals the stepwise estimation path.

fused_evaluate routes fully-cold normal-less pruned-backend pairs through
ops.fused.cold_pair_program (grids + 30-NN PCA normals + boundary + pair
sweeps in ONE jit). These tests pin: exact value equality with the stepwise
path, correct per-Cloud cache population, and the overflow fallback.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from open_pcc_metric_tpu.cloud import Cloud, synthetic_voxel_pair
from open_pcc_metric_tpu.ops import fused
from open_pcc_metric_tpu.ops import normals as nops


@pytest.fixture
def small_thresholds(monkeypatch):
    """Route 4k-point clouds through the big-cloud pruned/fold machinery."""
    monkeypatch.setattr(nops, "_PRUNE_THRESHOLD", 1024)
    # fresh ladders so memoized rungs from other tests don't leak in
    monkeypatch.setattr(nops, "_LADDER_MEMO", {})
    monkeypatch.setattr(fused, "_LADDER_MEMO", {})


def _pair(seed=11, n=4000):
    a, b = synthetic_voxel_pair(n, dtype=jnp.float32, seed=seed)
    if a.n > b.n:  # reference-D2 mode requires n_origin <= n_reconst
        a, b = b, a
    return a, b


@pytest.mark.parametrize("d2_mode", ["reference", "pc_error"])
def test_cold_fold_matches_stepwise(small_thresholds, monkeypatch, d2_mode):
    a1, b1 = _pair()
    taken = {}
    orig = fused._fused_evaluate_cold

    def spy(*args, **kw):
        taken["fold"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(fused, "_fused_evaluate_cold", spy)
    res_fold = fused.fused_evaluate(
        a1, b1, color_scheme="ycc", point_to_plane=True, d2_mode=d2_mode,
        backend="pruned")
    assert taken.get("fold"), "cold fold was not taken"
    # fold populated every per-Cloud cache
    for c in (a1, b1):
        assert getattr(c, "_grid", None) is not None
        assert getattr(c, "_est_normals", None) is not None
        assert getattr(c, "_sorted_normals", None) is not None
        assert getattr(c, "_boundary_stats", None) is not None

    a2, b2 = _pair()
    monkeypatch.setattr(fused, "_cold_fold_applicable",
                        lambda *a, **k: False)
    res_step = fused.fused_evaluate(
        a2, b2, color_scheme="ycc", point_to_plane=True, d2_mode=d2_mode,
        backend="pruned")
    assert set(res_fold) == set(res_step)
    for k in res_step:
        np.testing.assert_allclose(
            res_fold[k], res_step[k], rtol=1e-6, err_msg=k)

    # warm re-run (caches filled by the fold) stays consistent
    res_warm = fused.fused_evaluate(
        a1, b1, color_scheme="ycc", point_to_plane=True, d2_mode=d2_mode,
        backend="pruned")
    for k in res_step:
        np.testing.assert_allclose(
            res_warm[k], res_fold[k], rtol=1e-6, err_msg=k)


def test_cold_fold_normals_match_stepwise(small_thresholds):
    a1, b1 = _pair(seed=5)
    fused.fused_evaluate(a1, b1, point_to_plane=True, backend="pruned")
    a2, _ = _pair(seed=5)
    nrm_step = nops.estimate_normals_cloud(a2)
    # Same algorithm in a differently-fused jit program: bitwise equality is
    # not guaranteed (XLA fma/fusion choices), but the unit normals agree to
    # float precision with deterministic signs.
    np.testing.assert_allclose(
        np.asarray(a1._est_normals), np.asarray(nrm_step), atol=2e-6)


def test_cold_fold_overflow_falls_back(small_thresholds, monkeypatch):
    """A certificate overflow inside the fold must fall back stepwise and
    still produce exact results."""
    a, b = _pair(seed=7)

    calls = {"fold": 0}
    orig_prog = fused.cold_pair_program

    def always_overflow(*args, **kw):
        calls["fold"] += 1
        stats, cache = orig_prog(*args, **kw)
        stats = dict(stats)
        stats["nn_overflow"] = jnp.asarray(True)
        return stats, cache

    monkeypatch.setattr(fused, "cold_pair_program", always_overflow)
    res = fused.fused_evaluate(
        a, b, color_scheme="ycc", point_to_plane=True, backend="pruned")
    assert calls["fold"] == 1

    a2, b2 = _pair(seed=7)
    monkeypatch.setattr(fused, "_cold_fold_applicable",
                        lambda *a, **k: False)
    res_step = fused.fused_evaluate(
        a2, b2, color_scheme="ycc", point_to_plane=True, backend="pruned")
    for k in res_step:
        np.testing.assert_allclose(res[k], res_step[k], rtol=1e-6,
                                   err_msg=k)


def _with_unit_normals(c):
    nrm = np.zeros((c.padded_size, 3), np.float32)
    nrm[:, 2] = 1.0
    c.normals = jnp.asarray(nrm)
    return c


def test_fold_taken_with_file_normals_cold_state(small_thresholds,
                                                 monkeypatch):
    """File-normals pairs whose device state is cold fold too (sweep steady
    state: grids + qt8 + sorted colours built in the ONE dispatch), with
    estimation disabled on both sides; warm pairs keep the stepwise path."""
    a, b = map(_with_unit_normals, _pair(seed=3))
    calls = {"est": None}
    orig = fused.cold_pair_program

    def spy(*args, **kw):
        calls["est"] = (kw.get("est_a"), kw.get("est_b"))
        return orig(*args, **kw)

    monkeypatch.setattr(fused, "cold_pair_program", spy)
    res_fold = fused.fused_evaluate(
        a, b, color_scheme="ycc", point_to_plane=True, backend="pruned")
    assert calls["est"] == (False, False), calls["est"]
    for c in (a, b):
        assert getattr(c, "_grid", None) is not None
        assert getattr(c, "_qt8", None) is not None
        assert getattr(c, "_sorted_colors", None) is not None
    assert getattr(a, "_boundary_stats", None) is not None

    # Warm pair: every cache is populated, the fold must NOT run again.
    def boom(*args, **kw):  # pragma: no cover - fold must not re-run
        raise AssertionError("fold taken despite warm device state")

    monkeypatch.setattr(fused, "_fused_evaluate_cold", boom)
    res_warm = fused.fused_evaluate(
        a, b, color_scheme="ycc", point_to_plane=True, backend="pruned")

    a2, b2 = map(_with_unit_normals, _pair(seed=3))
    monkeypatch.setattr(fused, "_cold_fold_applicable",
                        lambda *a_, **k_: False)
    res_step = fused.fused_evaluate(
        a2, b2, color_scheme="ycc", point_to_plane=True, backend="pruned")
    for k in res_step:
        np.testing.assert_allclose(res_fold[k], res_step[k], rtol=1e-6,
                                   err_msg=k)
        np.testing.assert_allclose(res_warm[k], res_step[k], rtol=1e-6,
                                   err_msg=k)


def test_fold_taken_geometry_only_cold_state(small_thresholds, monkeypatch):
    """point_to_plane=False pairs with cold state also fold (no normals
    anywhere) and match the stepwise values."""
    a, b = _pair(seed=9)
    calls = {"est": None}
    orig = fused.cold_pair_program

    def spy(*args, **kw):
        calls["est"] = (kw.get("est_a"), kw.get("est_b"))
        return orig(*args, **kw)

    monkeypatch.setattr(fused, "cold_pair_program", spy)
    res_fold = fused.fused_evaluate(
        a, b, color_scheme="ycc", point_to_plane=False, backend="pruned")
    assert calls["est"] == (False, False), calls["est"]

    a2, b2 = _pair(seed=9)
    monkeypatch.setattr(fused, "_cold_fold_applicable",
                        lambda *a_, **k_: False)
    res_step = fused.fused_evaluate(
        a2, b2, color_scheme="ycc", point_to_plane=False, backend="pruned")
    assert set(res_fold) == set(res_step)
    for k in res_step:
        np.testing.assert_allclose(res_fold[k], res_step[k], rtol=1e-6,
                                   err_msg=k)


def test_partial_fold_sweep_shape(small_thresholds, monkeypatch):
    """Sweep steady state: the reference cloud is fully cached, only the
    degraded cloud estimates — still one program, values equal stepwise."""
    a, b1 = _pair(seed=21)
    # Warm the reference cloud's caches with a first pair.
    fused.fused_evaluate(a, b1, color_scheme="ycc", point_to_plane=True,
                         backend="pruned")
    assert getattr(a, "_est_normals", None) is not None

    _, b2 = _pair(seed=22)
    calls = {"n": 0, "est": None}
    orig = fused.cold_pair_program

    def spy(*args, **kw):
        calls["n"] += 1
        calls["est"] = (kw.get("est_a"), kw.get("est_b"))
        return orig(*args, **kw)

    monkeypatch.setattr(fused, "cold_pair_program", spy)
    res_fold = fused.fused_evaluate(
        a, b2, color_scheme="ycc", point_to_plane=True, backend="pruned")
    assert calls["n"] == 1
    assert calls["est"] == (False, True), calls["est"]
    assert getattr(b2, "_est_normals", None) is not None

    # Stepwise comparison on fresh clouds.
    a2, _ = _pair(seed=21)
    _, b3 = _pair(seed=22)
    monkeypatch.setattr(fused, "_cold_fold_applicable",
                        lambda *a_, **k_: False)
    res_step = fused.fused_evaluate(
        a2, b3, color_scheme="ycc", point_to_plane=True, backend="pruned")
    for k in res_step:
        np.testing.assert_allclose(res_fold[k], res_step[k], rtol=1e-6,
                                   err_msg=k)
