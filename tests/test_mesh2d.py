"""Composed 2-D mesh: data-parallel batch x sequence-sharded vocoding.

Demonstrates that the DP axis and the halo-exchange sequence axis compose on
one mesh — the serving shape for long-audio batch inference on a slice
(e.g. v5e-8 as (4, 2) = 4-way batch x 2-way sequence).
"""

import jax
import jax.numpy as jnp
import numpy as np

from music_synthesis_tpu.config import TINY
from music_synthesis_tpu.models.vocoder import Vocoder
from music_synthesis_tpu.parallel.mesh import make_mesh
from music_synthesis_tpu.parallel.seqshard import (
    make_seqshard_vocode,
    receptive_field_frames,
)

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import NamedSharding, PartitionSpec as P


def test_batch_and_sequence_sharded_vocoding():
    mesh = make_mesh((4, 2), ("data", "seq"))
    voc = Vocoder(TINY.vocoder)
    mel = jax.random.normal(jax.random.PRNGKey(0), (4, 64, TINY.vocoder.n_mels))
    params = voc.init(jax.random.PRNGKey(1), mel[:, :8])["params"]
    direct = np.asarray(voc.apply({"params": params}, mel))

    h = receptive_field_frames(TINY.vocoder) + 2

    def local(p, mel_local):  # [B_loc, T_loc, M] per device
        n_seq = jax.lax.axis_size("seq")
        idx = jax.lax.axis_index("seq")
        right_edge = mel_local[:, -h:, :]
        left_edge = mel_local[:, :h, :]
        left_halo = jax.lax.ppermute(
            right_edge, "seq", [(i, (i + 1) % n_seq) for i in range(n_seq)]
        )
        right_halo = jax.lax.ppermute(
            left_edge, "seq", [(i, (i - 1) % n_seq) for i in range(n_seq)]
        )
        left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
        right_halo = jnp.where(
            idx == n_seq - 1, jnp.zeros_like(right_halo), right_halo
        )
        padded = jnp.concatenate([left_halo, mel_local, right_halo], axis=1)
        wav = voc.apply({"params": p}, padded)
        hop = TINY.vocoder.hop_length
        return wav[:, h * hop : -h * hop]

    fn = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P("data", "seq", None)),
            out_specs=P("data", "seq"),
            check_vma=False,
        )
    )
    out = np.asarray(fn(params, mel))
    assert out.shape == direct.shape
    hop = TINY.vocoder.hop_length
    mid = slice(h * hop, -h * hop)
    np.testing.assert_allclose(out[:, mid], direct[:, mid], atol=2e-5)
