"""Config system: JSON-backed dataclass configs + optional interactive
prompts.

The reference's only "config system" is interactive ``input()`` loops with
defaults and validation (SURVEY.md §5; e.g. 31_clip:47-149, 33_run:19-57).
This module keeps the same decision points (dataset root, image type, class
subset, collection, model variant, test group) but as serialisable config
objects that work non-interactively (flags/JSON) with an opt-in prompt
helper for drop-in familiarity.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Callable, Sequence, TypeVar

T = TypeVar("T")


def load_config(cls: type[T], path: str | Path) -> T:
    """Instantiate a dataclass config from a JSON file (unknown keys error)."""
    with open(path) as f:
        data = json.load(f)
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(data) - names
    if unknown:
        raise KeyError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    return cls(**data)


def save_config(cfg: Any, path: str | Path) -> None:
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)


def merge_overrides(cfg: T, overrides: dict[str, Any]) -> T:
    """dataclasses.replace with key validation."""
    names = {f.name for f in dataclasses.fields(cfg)}
    unknown = set(overrides) - names
    if unknown:
        raise KeyError(f"unknown override keys: {sorted(unknown)}")
    return dataclasses.replace(cfg, **overrides)


# ------------------------------------------------------------ prompts
def _default_input(prompt: str) -> str:
    # Resolved at CALL time (a def-time ``input_fn=input`` default would
    # freeze whatever builtins.input was at import — breaking test
    # monkeypatching and any REPL that swaps stdin).
    import builtins

    return builtins.input(prompt)


def prompt_choice(
    question: str,
    options: Sequence[str],
    default: str | None = None,
    input_fn: Callable[[str], str] = _default_input,
    print_fn: Callable[[str], None] = print,
) -> str:
    """Numbered-menu prompt with a validation loop (the reference's UX:
    show options 1..N, re-ask on bad input)."""
    print_fn(question)
    for i, opt in enumerate(options, start=1):
        print_fn(f"{i}) {opt}")
    suffix = f" [default: {default}]" if default else ""
    while True:
        raw = input_fn(f"choice{suffix}: ").strip()
        if not raw and default is not None:
            return default
        if raw in options:
            return raw
        try:
            idx = int(raw) - 1
            if 0 <= idx < len(options):
                return options[idx]
        except ValueError:
            pass
        print_fn("invalid input, try again")


def prompt_yes_no(
    question: str,
    default: bool | None = None,
    input_fn: Callable[[str], str] = _default_input,
    print_fn: Callable[[str], None] = print,
) -> bool:
    suffix = "" if default is None else (" [Y/n]" if default else " [y/N]")
    while True:
        raw = input_fn(f"{question}{suffix}: ").strip().lower()
        if not raw and default is not None:
            return default
        if raw in ("y", "yes"):
            return True
        if raw in ("n", "no"):
            return False
        print_fn("please answer y or n")


def prompt_value(
    question: str,
    default: str | None = None,
    cast: Callable[[str], Any] = str,
    input_fn: Callable[[str], str] = _default_input,
    print_fn: Callable[[str], None] = print,
) -> Any:
    suffix = f" [default: {default}]" if default is not None else ""
    while True:
        raw = input_fn(f"{question}{suffix}: ").strip()
        if not raw and default is not None:
            raw = default
        try:
            return cast(raw)
        except (ValueError, TypeError):
            print_fn("invalid value, try again")
