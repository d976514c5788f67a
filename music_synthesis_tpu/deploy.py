"""AOT deployment artifacts: serialized StableHLO exports of the
inference paths (SURVEY.md §1 L5 serving surface, §3.4 fused inference;
reference citation impossible — mount empty, SURVEY.md §0).

The reference ships trained systems as notebooks that need the full
framework, configs and weight files on the serving host. The TPU-native
deployment story is the opposite: ``jax.export`` traces the jitted
program once, bakes the trained parameters into the StableHLO module as
constants, and serializes a self-contained artifact that any JAX runtime
targeting the right platform can deserialize and call — no model code,
no config parsing, no separate weight files at the serving side, and no
risk of a serving-host Flax/config drift changing the math. One artifact
can carry several target platforms (e.g. ``("tpu", "cpu")``) and a
symbolic batch dimension so a single file serves any batch size.

File format (``.msx``)::

    MAGIC(6) | u64 header_len | header JSON | Exported payload bytes

The header carries the I/O specs, target platforms, baked parameter
count and free-form provenance (zoo card metrics, train run name) so an
operator can audit an artifact without loading it.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .config import PipelineConfig, VocoderConfig
from .models.specgan import SpectrogramGenerator
from .models.vocoder import Vocoder

__all__ = [
    "MAGIC",
    "FORMAT_VERSION",
    "DeployArtifact",
    "export_callable",
    "vocoder_artifact",
    "pipeline_artifact",
    "save_artifact",
    "load_artifact",
]

MAGIC = b"MSXART"
FORMAT_VERSION = 1

# Name of the symbolic batch dimension used when batch=None.
_BATCH_SYM = "b"


@dataclasses.dataclass(frozen=True)
class DeployArtifact:
    """A deserialized deployment artifact: callable program + meta."""

    exported: Any  # jax.export.Exported
    meta: dict

    def __call__(self, *args):
        return self.exported.call(*args)

    @property
    def platforms(self) -> tuple[str, ...]:
        return tuple(self.meta["platforms"])


def _batch_dim(batch: int | None):
    """Concrete batch size, or a symbolic dimension for batch=None."""
    if batch is None:
        (b,) = jax_export.symbolic_shape(_BATCH_SYM)
        return b
    if batch < 1:
        raise ValueError(f"batch must be >= 1 or None (symbolic), got {batch}")
    return batch


def _spec_meta(avals) -> list[dict]:
    """JSON-safe I/O spec: symbolic dims render as their name (e.g. 'b')."""
    return [
        {"shape": [int(d) if isinstance(d, int) else str(d) for d in a.shape],
         "dtype": str(a.dtype)}
        for a in avals
    ]


def export_callable(
    fn: Callable,
    in_specs: Sequence[jax.ShapeDtypeStruct],
    *,
    platforms: Sequence[str] = ("tpu",),
) -> Any:
    """Trace + lower ``fn`` at ``in_specs`` for ``platforms``.

    Anything ``fn`` closes over (trained parameters, config constants)
    is baked into the StableHLO module; the result is self-contained.
    """
    return jax_export.export(jax.jit(fn), platforms=list(platforms))(*in_specs)


def vocoder_artifact(
    params,
    config: VocoderConfig,
    n_frames: int,
    *,
    batch: int | None = None,
    platforms: Sequence[str] = ("tpu",),
    provenance: dict | None = None,
) -> tuple[Any, dict]:
    """Export copy-synthesis: normalized mel ``[B, T, M] -> wav [B, T*hop]``.

    ``batch=None`` exports a symbolic batch dimension — one artifact, any
    batch size. ``n_frames`` stays concrete: serving buckets durations
    the same way ``serve.py`` does, and a static time axis is what lets
    XLA pick MXU-shaped conv tilings instead of fully dynamic loops.
    """
    voc = Vocoder(config)

    def fn(mel):
        return voc.apply({"params": params}, mel)

    b = _batch_dim(batch)
    spec = jax.ShapeDtypeStruct((b, n_frames, config.n_mels), jnp.float32)
    exported = export_callable(fn, [spec], platforms=platforms)
    meta = _meta("vocoder_copy_synthesis", exported, params, provenance)
    return exported, meta


def pipeline_artifact(
    cfg: PipelineConfig,
    specgan_params,
    vocoder_params,
    *,
    batch: int | None = None,
    platforms: Sequence[str] = ("tpu",),
    provenance: dict | None = None,
) -> tuple[Any, dict]:
    """Export the full two-stage pipeline: latent ``[B, Z] -> wav [B, L]``.

    Same fused program as ``infer.generate.generate`` (stage-1 generator,
    mel chunking, batched vocoder, windowed OLA — one XLA module), with
    both parameter sets baked in.
    """
    from .infer.generate import generate

    def fn(z):
        return generate(cfg, specgan_params, vocoder_params, z)

    b = _batch_dim(batch)
    spec = jax.ShapeDtypeStruct((b, cfg.specgan.latent_dim), jnp.float32)
    exported = export_callable(fn, [spec], platforms=platforms)
    both = {"specgan": specgan_params, "vocoder": vocoder_params}
    meta = _meta("two_stage_generate", exported, both, provenance)
    return exported, meta


def _meta(kind: str, exported, baked_params, provenance: dict | None) -> dict:
    return {
        "format_version": FORMAT_VERSION,
        "kind": kind,
        "platforms": list(exported.platforms),
        "inputs": _spec_meta(exported.in_avals),
        "outputs": _spec_meta(exported.out_avals),
        "n_params_baked": sum(
            int(x.size) for x in jax.tree.leaves(baked_params)
        ),
        "jax_version": jax.__version__,
        "provenance": provenance or {},
    }


def save_artifact(path: Path | str, exported, meta: dict) -> Path:
    """Write ``exported`` + ``meta`` as one self-contained ``.msx`` file."""
    payload = bytes(exported.serialize())
    header = json.dumps(meta).encode("utf-8")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(payload)
    return path


def read_meta(path: Path | str) -> dict:
    """Read just the JSON header — audit an artifact without deserializing
    (and without even having the target platform available)."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(
                f"{path}: not a deployment artifact (bad magic {magic!r})"
            )
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode("utf-8"))
    if meta.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(
            f"{path}: format_version {meta['format_version']} is newer than "
            f"this framework understands ({FORMAT_VERSION})"
        )
    return meta


def load_artifact(path: Path | str) -> DeployArtifact:
    """Deserialize an ``.msx`` artifact into a callable program."""
    meta = read_meta(path)
    with open(path, "rb") as f:
        f.seek(len(MAGIC))
        (hlen,) = struct.unpack("<Q", f.read(8))
        f.seek(len(MAGIC) + 8 + hlen)
        payload = f.read()
    exported = jax_export.deserialize(bytearray(payload))
    return DeployArtifact(exported=exported, meta=meta)
