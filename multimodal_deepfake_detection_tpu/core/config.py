"""Dataclass configs with CLI overrides.

The reference hard-codes every hyperparameter as module constants
(``/root/reference/test_au_face.py:17-53``; SURVEY.md §5 'Config / flag
system' — no argparse anywhere). Here each entry point declares a frozen-shape
dataclass whose defaults reproduce the reference values verbatim, and any
field is overridable as ``--field value`` (or ``--field=value``) on the
command line — so scripted runs match the reference bit-for-bit while sweeps
need no source edits.
"""
from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Sequence, Type, TypeVar, get_args, get_origin

T = TypeVar("T")


def _parse_value(field_type, raw: str):
    if field_type is bool or field_type == Optional[bool]:
        return raw.lower() in ("1", "true", "yes", "on")
    for t in (int, float, str):
        if field_type is t or field_type == Optional[t]:
            return t(raw)
    if get_origin(field_type) in (list, tuple, Sequence) or get_origin(field_type) is not None:
        inner = (get_args(field_type) or (str,))[0]
        return tuple(inner(v) for v in raw.split(","))
    return raw


def parse_config(cls: Type[T], argv: Optional[Sequence[str]] = None, *, prog: Optional[str] = None) -> T:
    """Build ``cls()`` then apply ``--field value`` overrides from argv."""
    parser = argparse.ArgumentParser(
        prog=prog or cls.__name__,
        description=(cls.__doc__ or "").strip().splitlines()[0] if cls.__doc__ else None,
    )
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for f in fields.values():
        default = f.default if f.default is not dataclasses.MISSING else (
            f.default_factory() if f.default_factory is not dataclasses.MISSING else None
        )
        parser.add_argument(f"--{f.name}", default=None, metavar=str(default), help=f"default: {default}")
    ns = parser.parse_args(argv)
    overrides = {}
    for name, f in fields.items():
        raw = getattr(ns, name)
        if raw is not None:
            overrides[name] = _parse_value(f.type if not isinstance(f.type, str) else _resolve(cls, f.name), raw)
    return cls(**overrides)


def _resolve(cls, name):
    # dataclass field types may be strings under `from __future__ import annotations`
    import typing

    hints = typing.get_type_hints(cls)
    return hints[name]
