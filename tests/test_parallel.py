"""Mesh / sharding tests: mesh construction, sequence-parallel scan
exactness on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from velocity_asr_tpu.ops.scan import selective_scan_parallel
from velocity_asr_tpu.parallel.mesh import create_mesh, shard_batch
from velocity_asr_tpu.parallel.sp_scan import selective_scan_sequence_parallel


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = create_mesh(n_data=4, n_model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh()
    batch = {"x": np.zeros((16, 4), np.float32)}
    placed = shard_batch(mesh, batch)
    assert len(placed["x"].addressable_shards) == 8
    assert placed["x"].addressable_shards[0].data.shape == (2, 4)


def test_sequence_parallel_scan_matches_full():
    mesh = create_mesh()
    rng = np.random.default_rng(0)
    Bsz, L, Di, N = 2, 64, 8, 4  # L = 8 shards x 8 steps
    x = jnp.asarray(rng.standard_normal((Bsz, L, Di)), jnp.float32)
    dt = jnp.asarray(np.abs(rng.standard_normal((Bsz, L, Di))) * 0.4, jnp.float32)
    A = -jnp.exp(jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32)))
    Bc = jnp.asarray(rng.standard_normal((Bsz, L, N)), jnp.float32)
    Cc = jnp.asarray(rng.standard_normal((Bsz, L, N)), jnp.float32)
    D = jnp.asarray(rng.standard_normal((Di,)), jnp.float32)

    full = selective_scan_parallel(x, dt, A, Bc, Cc, D)
    sp = selective_scan_sequence_parallel(x, dt, A, Bc, Cc, D, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(full), np.asarray(sp), rtol=1e-5, atol=1e-5)


def test_sequence_parallel_scan_jitted():
    mesh = create_mesh()
    rng = np.random.default_rng(1)
    Bsz, L, Di, N = 1, 32, 4, 2
    args = (
        jnp.asarray(rng.standard_normal((Bsz, L, Di)), jnp.float32),
        jnp.asarray(np.abs(rng.standard_normal((Bsz, L, Di))) * 0.3, jnp.float32),
        -jnp.exp(jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32))),
        jnp.asarray(rng.standard_normal((Bsz, L, N)), jnp.float32),
        jnp.asarray(rng.standard_normal((Bsz, L, N)), jnp.float32),
        jnp.asarray(rng.standard_normal((Di,)), jnp.float32),
    )
    fn = jax.jit(
        lambda *a: selective_scan_sequence_parallel(*a, mesh=mesh, axis="data")
    )
    full = selective_scan_parallel(*args)
    np.testing.assert_allclose(np.asarray(fn(*args)), np.asarray(full), rtol=1e-5, atol=1e-5)
