"""Tensor-parallel SERVING: generation with TP-sharded decoder params.

The multichip dryrun covers the sharded train step; this covers the decode
path — a 7B that does not fit one chip serves tp-sharded, and the generated
tokens must be identical to the replicated run (XLA inserts the collectives;
the KV cache shards along kv-heads by propagation from the params)."""

import jax
import jax.numpy as jnp
import numpy as np

from infinite_video_tpu.models.decoder import Decoder, tiny_decoder_config
from infinite_video_tpu.parallel.mesh import make_mesh
from infinite_video_tpu.parallel.sharding import shard_params
from infinite_video_tpu.runtime.generation import GenerationConfig, generate


def test_tp_sharded_generation_matches_replicated():
    cfg = tiny_decoder_config()  # 4 heads / 2 kv heads: tp=2 divides both
    model = Decoder(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        input_ids=jnp.zeros((1, 4), jnp.int32))["params"]
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 512, (2, 7)),
                      jnp.int32)
    gcfg = GenerationConfig(max_new_tokens=8, do_sample=False, eos_token_id=-1,
                            pad_to_multiple=8)

    base = generate(model, params, gcfg, prompt_ids=ids)

    mesh = make_mesh(dp=4, tp=2)
    sharded = shard_params(params, mesh)
    with mesh:
        out = generate(model, sharded, gcfg, prompt_ids=ids)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))

    # the projections really are partitioned over tp
    q_sh = sharded["layer_0"]["q_proj"]["kernel"].sharding
    assert "tp" in (q_sh.spec if hasattr(q_sh, "spec") else ()), q_sh
