"""Training-path tests: full LDM train step, CLAP contrastive loss with
cross-device gather, and the multichip dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from audioldm2_tpu import pipeline
from audioldm2_tpu.parallel import train as train_lib
from tiny import tiny_t5_model_config


def test_full_train_step_reduces_loss():
    cfg = tiny_t5_model_config()
    params = pipeline.init_params(jax.random.PRNGKey(0), cfg)
    model = pipeline.AudioLDM2(cfg, params)
    params = model.ldm.params

    opt = optax.adamw(1e-3)
    step = jax.jit(train_lib.make_full_train_step(cfg, opt))
    opt_state = opt.init(params["unet"])

    rng = np.random.default_rng(0)
    batch = model.make_batch("rain", batchsize=2)
    batch["fbank"] = rng.standard_normal((2, 32, 16, 1)).astype(np.float32)

    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # same-batch overfit: loss should drop noticeably
    assert min(losses[4:]) < losses[0]


def test_clap_contrastive_loss_gather():
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("dp",))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 16)).astype(np.float32)
    t = rng.standard_normal((8, 16)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)

    # single-device full-batch loss
    want = float(train_lib.clap_contrastive_loss(a, t, 10.0))

    # sharded: each device holds 2 rows, gathers over dp
    f = shard_map(
        lambda a, t: train_lib.clap_contrastive_loss(a, t, 10.0, axis_name="dp"),
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P(),
        check_rep=False,
    )
    got = float(jax.jit(f)(a, t))
    assert abs(got - want) < 1e-5


@pytest.mark.slow  # includes the production-geometry GSPMD infer dryrun
def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
