import numpy as np
import jax.numpy as jnp
import pytest

from staticmapping_tpu.ops import nn_search


def brute_nn(q, t):
    d = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.argmin(1)


def test_nearest_1_exact():
    rng = np.random.default_rng(0)
    t = rng.uniform(-20, 20, size=(1000, 3)).astype(np.float32)
    q = rng.uniform(-20, 20, size=(500, 3)).astype(np.float32)
    tgt = np.full((2048, 3), 1e6, dtype=np.float32)
    tgt[:1000] = t
    mask = np.zeros(2048, dtype=bool)
    mask[:1000] = True
    d2, idx = nn_search.nearest_1(jnp.asarray(q), jnp.asarray(tgt),
                                  jnp.asarray(mask), tile=512)
    ref_d, ref_i = brute_nn(q, t)
    np.testing.assert_allclose(np.asarray(d2), ref_d, atol=1e-3)
    # indices can differ on exact ties; check distances of chosen points
    chosen = ((q - t[np.asarray(idx)]) ** 2).sum(1)
    np.testing.assert_allclose(chosen, ref_d, atol=1e-3)


def test_nearest_1_ignores_invalid():
    # nearest point is invalid → should pick the valid one farther away
    t = np.array([[0.0, 0, 0], [10.0, 0, 0]], dtype=np.float32)
    tgt = np.full((512, 3), 1e6, dtype=np.float32)
    tgt[:2] = t
    mask = np.zeros(512, dtype=bool)
    mask[1] = True  # only the far point valid
    q = np.array([[0.1, 0, 0]], dtype=np.float32)
    d2, idx = nn_search.nearest_1(jnp.asarray(q), jnp.asarray(tgt),
                                  jnp.asarray(mask), tile=512)
    assert int(idx[0]) == 1
    np.testing.assert_allclose(float(d2[0]), 9.9 ** 2, rtol=1e-4)


def test_knn_matches_brute():
    rng = np.random.default_rng(1)
    t = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    q = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    tgt = np.full((512, 3), 1e6, dtype=np.float32)
    tgt[:300] = t
    mask = np.zeros(512, dtype=bool)
    mask[:300] = True
    k = 5
    d2, idx = nn_search.knn(jnp.asarray(q), jnp.asarray(tgt),
                            jnp.asarray(mask), k=k, tile=256)
    full = ((q[:, None, :] - t[None, :, :]) ** 2).sum(-1)
    ref = np.sort(full, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1), ref, atol=1e-3)


def test_masked_quantile():
    vals = jnp.asarray(np.array([5.0, 1.0, 3.0, 2.0, 4.0, 99.0, 98.0]))
    mask = jnp.asarray(np.array([True] * 5 + [False, False]))
    # reference picks sorted[floor(count*q)] → count=5, q=0.7 → idx 3 → 4.0
    q = nn_search.masked_quantile(vals, mask, 0.7)
    assert float(q) == 4.0
    # q=1.0 clamps to the max valid
    q = nn_search.masked_quantile(vals, mask, 1.0)
    assert float(q) == 5.0


# ---------------------------------------------------------------------------
# Pallas kernel correctness (runs only when a real TPU is attached — the
# benched fast path must match the portable scan path exactly) and CPU
# contract tests for the chunk/padding helpers.
# ---------------------------------------------------------------------------

def test_pick_chunk_contract():
    from staticmapping_tpu.ops.nn_search import _pick_chunk
    for size in (128, 256, 384, 512, 1024, 4096, 8192, 32768):
        for pref in (128, 512, 4096):
            c = _pick_chunk(size, pref)
            assert size % c == 0, (size, pref, c)
            assert c <= size


def test_pallas_matches_scan_on_tpu():
    import jax
    from staticmapping_tpu.ops import nn_search

    # build a second, TPU-backed context only if the platform exists
    try:
        tpu_devices = jax.devices("tpu")
    except RuntimeError:
        tpu_devices = []
    if not tpu_devices:
        pytest.skip("no TPU attached — pallas path not reachable")

    rng = np.random.default_rng(0)
    q = rng.uniform(-20, 20, (512, 3)).astype(np.float32)
    t = rng.uniform(-20, 20, (4096, 3)).astype(np.float32)
    mask = np.ones(4096, dtype=bool)
    mask[4000:] = False

    d_tpu, i_tpu = jax.device_put(
        nn_search.nearest_1(
            jax.device_put(jnp.asarray(q), tpu_devices[0]),
            jax.device_put(jnp.asarray(t), tpu_devices[0]),
            jax.device_put(jnp.asarray(mask), tpu_devices[0])))
    d_ref, i_ref = nn_search._nearest_scan(
        jnp.asarray(q),
        jnp.where(jnp.asarray(mask)[:, None], jnp.asarray(t), 1.0e5),
        jnp.asarray(mask), tile=512)
    assert np.allclose(np.asarray(d_tpu), np.asarray(d_ref), atol=1e-2)
    agree = np.mean(np.asarray(i_tpu) == np.asarray(i_ref))
    assert agree > 0.999, agree   # ties may break differently
