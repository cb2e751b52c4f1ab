import numpy as np
import jax

from vsta_tpu.training.checkpoint import CheckpointManager
from vsta_tpu.training.optim import build_optimizer
from vsta_tpu.training.state import create_state, make_train_step

from test_train_step import tiny_cfg, make_batch


def test_save_restore_roundtrip(tmp_path):
    cfg = tiny_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    for _ in range(3):
        state, _ = step(state, batch)

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("last", state, epoch=7, best_f1=0.42)
    assert ckpt.exists("last")

    fresh = create_state(cfg, tx, jax.random.PRNGKey(1))
    restored, epoch, best = ckpt.restore("last", fresh)
    assert epoch == 7 and np.isclose(best, 0.42)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_training_continues_identically(tmp_path):
    """A restored state must produce the same next step as the original."""
    cfg = tiny_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_state(cfg, tx, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    state, _ = step(state, batch)

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("last", state, epoch=0, best_f1=-1.0)
    restored, _, _ = ckpt.restore("last", create_state(cfg, tx, jax.random.PRNGKey(9)))

    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-6
    )
