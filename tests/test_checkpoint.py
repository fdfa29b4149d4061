"""Checkpointer tests: save, best-step selection, sharded restore."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from coral_tpu.parallel import create_mesh, replicated, zero_shardings
from coral_tpu.training import TrainState
from coral_tpu.training.checkpoint import Checkpointer, abstract_state_like


@pytest.fixture()
def sharded_state():
    mesh = create_mesh()
    params = {
        "dense": {"kernel": jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)},
        "bias": jnp.ones((128,), jnp.float32),
    }
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx)
    param_sh = jax.tree.map(lambda _: replicated(mesh), state.params)
    opt_sh = zero_shardings(state.opt_state, mesh, min_size=128)
    state_sh = TrainState(step=replicated(mesh), params=param_sh,
                          opt_state=opt_sh)
    return jax.device_put(state, state_sh)


def test_save_restore_roundtrip(tmp_path, sharded_state):
    ckpt = Checkpointer(tmp_path / "ckpts", save_total_limit=3,
                        metric_name="val_cer")
    ckpt.save(1, sharded_state, metrics={"val_cer": 0.5})
    ckpt.wait()
    assert ckpt.latest_step() == 1

    restored = ckpt.restore(abstract_state_like(sharded_state), step=1)
    np.testing.assert_array_equal(
        np.asarray(restored.params["dense"]["kernel"]),
        np.asarray(sharded_state.params["dense"]["kernel"]),
    )
    # the restored optimizer state keeps its ZeRO sharding
    leaf = jax.tree.leaves(restored.opt_state)[0]
    assert leaf.sharding == jax.tree.leaves(sharded_state.opt_state)[0].sharding
    ckpt.close()


def test_best_step_tracks_metric(tmp_path, sharded_state):
    ckpt = Checkpointer(tmp_path / "ckpts", save_total_limit=5,
                        metric_name="val_cer")
    for step, cer_value in ((1, 0.9), (2, 0.3), (3, 0.6)):
        state = sharded_state.replace(
            step=jnp.asarray(step, jnp.int32)
        )
        ckpt.save(step, state, metrics={"val_cer": cer_value})
    ckpt.wait()
    assert ckpt.best_step() == 2  # lowest CER wins
    assert ckpt.latest_step() == 3
    ckpt.close()


def test_save_total_limit_evicts(tmp_path, sharded_state):
    ckpt = Checkpointer(tmp_path / "ckpts", save_total_limit=2,
                        metric_name=None)
    for step in (1, 2, 3, 4):
        ckpt.save(step, sharded_state)
    ckpt.wait()
    steps = sorted(
        int(p.name) for p in (tmp_path / "ckpts").iterdir()
        if p.name.isdigit()
    )
    assert len(steps) <= 2 and 4 in steps
    ckpt.close()
