"""Migrate PyTorch reference checkpoints into this framework's bundles.

Users of the reference bring ``.pth`` files in four flavors (SURVEY.md §2.4
'Checkpoint formats'); this CLI detects the flavor and emits the equivalent
``.npz`` bundle:

* plain Xception state_dict (e.g. the pretrained ImageNet weights the frozen
  backbone uses, ``/root/reference/Xception.py:205-213``) -> ``{model, state}``
* XceptionLSTMV/A state_dict (``train_audio.py:87``) -> ``{model, state}``
* ``{"model", "arcface"}`` dict (``train_visual.py:633-636``) ->
  ``{model, arcface, state}``
* DataParallel/EMA containers are unwrapped (``module.`` strip, ``n_averaged``
  drop — ``test_au_face.py:107-141``).

Requires torch (CPU) to deserialize the ``.pth``.
"""
from __future__ import annotations

import dataclasses

from ..core.config import parse_config


@dataclasses.dataclass
class Config:
    src: str = ""  # input .pth
    dst: str = ""  # output .npz bundle
    kind: str = "auto"  # 'auto' | 'xception' | 'xception_lstm' | 'lstm_arcface'


def _detect(sd) -> str:
    keys = set(sd)
    if any(k.startswith("feature_extractor.") for k in keys):
        return "xception_lstm"
    if "conv1.weight" in keys and "block1.rep.0.conv1.weight" in keys:
        return "xception"
    raise ValueError(f"unrecognized checkpoint layout; first keys: {sorted(keys)[:8]}")


def convert(raw, kind: str, log=print):
    from ..core.checkpoint import save_bundle
    from ..utils.torch_port import (
        arcface_params_from_torch,
        strip_prefixes,
        xception_lstm_params_from_torch,
        xception_params_from_torch,
    )

    out = {}
    _unwrap = lambda sd: strip_prefixes(sd, prefixes=("module.",))
    if isinstance(raw, dict) and "model" in raw and not any(
        hasattr(v, "shape") for v in raw.values() if not isinstance(v, dict)
    ):
        # bundle dict: {"model": sd, "arcface": sd, ...}
        model_sd = _unwrap(raw["model"])
        kind = _detect(model_sd) if kind == "auto" else kind
        if kind == "xception_lstm":
            params, state = xception_lstm_params_from_torch(model_sd)
        else:
            params, state = xception_params_from_torch(model_sd)
        out["model"], out["state"] = params, state
        if "arcface" in raw:
            out["arcface"] = arcface_params_from_torch(_unwrap(raw["arcface"]))
        if "embed" in raw:
            from ..utils.torch_port import embed_head_params_from_torch

            out["embed"] = embed_head_params_from_torch(_unwrap(raw["embed"]))
        log(f"converted bundle dict as {kind} (+{'arcface' if 'arcface' in raw else ''})")
        return out

    sd = _unwrap(raw if isinstance(raw, dict) else raw.state_dict())
    kind = _detect(sd) if kind == "auto" else kind
    if kind == "xception_lstm":
        params, state = xception_lstm_params_from_torch(sd)
    elif kind == "xception":
        params, state = xception_params_from_torch(sd)
    else:
        raise ValueError(f"unknown kind {kind!r}")
    log(f"converted state_dict as {kind}")
    return {"model": params, "state": state}


def main(argv=None, *, log=print):
    config = parse_config(Config, argv, prog="import_torch")
    if not config.src or not config.dst:
        raise SystemExit("--src input.pth and --dst output.npz are required")
    import torch

    raw = torch.load(config.src, map_location="cpu", weights_only=False)
    from ..core.checkpoint import save_bundle

    out = convert(raw, config.kind, log=log)
    save_bundle(config.dst, out)
    log(f"wrote {config.dst}")
    return out


if __name__ == "__main__":
    main()
