"""Pretrained model zoo: small committed weight artifacts + model cards.

The reference ships trained results only as notebook audio; a framework user
needs loadable weights (SURVEY.md §1 L5, ROADMAP "trained model zoo"). Each
zoo entry is a directory:

    zoo/<name>/params.msgpack   flax-serialized parameter pytree (fp32)
    zoo/<name>/card.json        kind, model config, front-end config,
                                mel scaler, eval metrics, provenance notes

Entries are self-describing: ``load_pretrained`` rebuilds the exact model
config the weights were trained with (including the corpus-derived MelScaler,
which conditioning must reproduce bit-for-bit for copy-synthesis to work).

Usage:
    from music_synthesis_tpu import zoo
    entry = zoo.load_pretrained("vocoder_rich50k")
    voc = Vocoder(entry.config)
    wav = voc.apply({"params": entry.params}, mel)
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import flax.serialization
import jax
import numpy as np

from .config import (
    FrontendConfig,
    MelScaler,
    SpecGANConfig,
    VocoderConfig,
)

__all__ = [
    "ZOO_ROOT",
    "PretrainedEntry",
    "save_pretrained",
    "load_pretrained",
    "list_pretrained",
]

ZOO_ROOT = Path(__file__).resolve().parents[1] / "zoo"

_KIND_TO_CONFIG = {"vocoder": VocoderConfig, "specgan": SpecGANConfig}


def _listify(obj: Any) -> Any:
    """dataclass -> JSON-safe nested dict/list."""
    if dataclasses.is_dataclass(obj):
        return {f.name: _listify(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, (tuple, list)):
        return [_listify(x) for x in obj]
    return obj


def _tuplify(obj: Any) -> Any:
    """JSON round-trip turns tuples into lists; config fields want tuples."""
    if isinstance(obj, list):
        return tuple(_tuplify(x) for x in obj)
    return obj


def _config_from_dict(cls, d: dict) -> Any:
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - known
    if unknown:
        raise ValueError(
            f"zoo card has fields {sorted(unknown)} not in {cls.__name__}; "
            "the entry was saved by a newer version of the framework"
        )
    return cls(**{k: _tuplify(v) for k, v in d.items()})


@dataclasses.dataclass(frozen=True)
class PretrainedEntry:
    name: str
    kind: str  # "vocoder" | "specgan"
    config: Any  # VocoderConfig | SpecGANConfig
    params: Any  # parameter pytree (numpy leaves)
    frontend: FrontendConfig | None
    mel_scaler: MelScaler | None
    card: dict  # full card.json contents (metrics, notes, provenance)


def save_pretrained(
    name: str,
    kind: str,
    params: Any,
    model_config: Any,
    *,
    frontend: FrontendConfig | None = None,
    mel_scaler: MelScaler | None = None,
    metrics: dict | None = None,
    notes: str = "",
    root: Path | str = ZOO_ROOT,
) -> Path:
    """Write a zoo entry (msgpack weights + JSON model card) under ``root``."""
    if kind not in _KIND_TO_CONFIG:
        raise ValueError(f"kind must be one of {sorted(_KIND_TO_CONFIG)}")
    expected = _KIND_TO_CONFIG[kind]
    if not isinstance(model_config, expected):
        raise TypeError(f"model_config for kind={kind!r} must be "
                        f"{expected.__name__}, got {type(model_config).__name__}")
    out = Path(root) / name
    out.mkdir(parents=True, exist_ok=True)
    # fp32 numpy leaves: device-independent, exact restore.
    host = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    (out / "params.msgpack").write_bytes(flax.serialization.to_bytes(host))
    n_params = sum(int(x.size) for x in jax.tree.leaves(host))
    card = {
        "name": name,
        "kind": kind,
        "n_params": n_params,
        "config": _listify(model_config),
        "frontend": _listify(frontend) if frontend else None,
        "mel_scaler": _listify(mel_scaler) if mel_scaler else None,
        "metrics": metrics or {},
        "notes": notes,
    }
    (out / "card.json").write_text(json.dumps(card, indent=1))
    return out


def load_pretrained(
    name: str, root: Path | str = ZOO_ROOT
) -> PretrainedEntry:
    """Load a zoo entry by name, or by path to an entry directory."""
    entry_dir = Path(name) if Path(name).is_dir() else Path(root) / name
    card_file = entry_dir / "card.json"
    if not card_file.exists():
        avail = list_pretrained(root)
        raise FileNotFoundError(
            f"no zoo entry at {entry_dir}; available: {avail or 'none'}"
        )
    card = json.loads(card_file.read_text())
    cfg = _config_from_dict(_KIND_TO_CONFIG[card["kind"]], card["config"])
    params = flax.serialization.msgpack_restore(
        (entry_dir / "params.msgpack").read_bytes()
    )
    n = sum(int(x.size) for x in jax.tree.leaves(params))
    if n != card["n_params"]:
        raise ValueError(f"zoo entry {card['name']}: params.msgpack has {n} "
                         f"parameters but card says {card['n_params']}")
    fe = (_config_from_dict(FrontendConfig, card["frontend"])
          if card.get("frontend") else None)
    ms = (_config_from_dict(MelScaler, card["mel_scaler"])
          if card.get("mel_scaler") else None)
    return PretrainedEntry(
        name=card["name"], kind=card["kind"], config=cfg, params=params,
        frontend=fe, mel_scaler=ms, card=card,
    )


def list_pretrained(root: Path | str = ZOO_ROOT) -> list[str]:
    """Names of all zoo entries under ``root`` (sorted)."""
    root = Path(root)
    if not root.is_dir():
        return []
    return sorted(p.parent.name for p in root.glob("*/card.json"))
