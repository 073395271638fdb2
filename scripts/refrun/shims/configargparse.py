"""Minimal configargparse shim for running the reference on CPU.

The reference (`/root/reference/config_parser.py:4-10`) uses
configargparse's two-level config files (``--config`` base overridden by
``--config1``).  This shim reproduces exactly the subset the reference
exercises:

* ``add_argument(..., is_config_file=True)`` registers a config-file arg;
* config files hold ``key = value`` lines, bare ``key`` lines for
  store_true flags, and ``#`` comments;
* later config files override earlier ones, and explicit command-line
  args override both (configargparse precedence);
* keys resolve by unique *prefix* against registered option names (the
  reference's configs say ``i_weight`` for ``--i_weights``).

Interface-only reimplementation; no configargparse code consulted.
"""
from __future__ import annotations

import argparse
import sys

_TRUEISH = {"true", "yes", "1", "on"}
_FALSEISH = {"false", "no", "0", "off"}


class ArgumentParser(argparse.ArgumentParser):
    def __init__(self, *args, **kwargs):
        kwargs.pop("default_config_files", None)
        super().__init__(*args, **kwargs)
        self._config_file_dests = []

    def add_argument(self, *args, **kwargs):  # type: ignore[override]
        is_cfg = kwargs.pop("is_config_file", False)
        action = super().add_argument(*args, **kwargs)
        if is_cfg:
            self._config_file_dests.append(action.dest)
        return action

    # -- config-file expansion -------------------------------------------
    def _resolve_key(self, key: str) -> argparse.Action | None:
        cands = [a for a in self._actions if a.dest == key]
        if not cands:
            cands = [a for a in self._actions
                     if a.dest.startswith(key) and a.option_strings]
        if len(cands) > 1:
            raise SystemExit(f"config key '{key}' is ambiguous: "
                             f"{[a.dest for a in cands]}")
        return cands[0] if cands else None

    def _read_config(self, path: str) -> list[str]:
        out: list[str] = []
        with open(path) as f:
            for raw in f:
                line = raw.split("#", 1)[0].strip()
                if not line:
                    continue
                if "=" in line:
                    key, val = (s.strip() for s in line.split("=", 1))
                else:
                    key, val = line, ""
                action = self._resolve_key(key)
                if action is None:
                    raise SystemExit(f"unknown config key '{key}' in {path}")
                flag = action.option_strings[0]
                if isinstance(action, (argparse._StoreTrueAction,
                                       argparse._StoreFalseAction)):
                    if val == "" or val.lower() in _TRUEISH:
                        out.append(flag)
                    elif val.lower() not in _FALSEISH:
                        raise SystemExit(
                            f"bad boolean '{val}' for '{key}' in {path}")
                else:
                    out.extend([flag, val])
        return out

    def parse_args(self, args=None, namespace=None):  # type: ignore[override]
        argv = list(sys.argv[1:]) if args is None else list(args)
        cfg_args: list[str] = []
        for dest in self._config_file_dests:
            flag = "--" + dest
            for i, a in enumerate(argv):
                path = None
                if a == flag and i + 1 < len(argv):
                    path = argv[i + 1]
                elif a.startswith(flag + "="):
                    path = a.split("=", 1)[1]
                if path:
                    cfg_args.extend(self._read_config(path))
        return super().parse_args(cfg_args + argv, namespace)
