"""Shared CLI plumbing.

Reference surface: ``vq/train.py:15-49`` — ``NAME CONFIG
[--config-options K=V ...] [--override PATH=VALUE ...]
[--load-model-from CKPT ...] [--load-from CKPT] [--auto-resume]``;
seed 3407; ``custom_imports`` imported before building the runner.
"""

from __future__ import annotations

import argparse
import ast
import importlib
import logging
import os
import sys
from typing import Any

from ..utils.config import Config, load_config

__all__ = ["build_parser", "parse_kv", "prepare", "log_run"]

logger = logging.getLogger("vector_quantization_tpu")


def parse_kv(pairs: list[str]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for pair in pairs or []:
        key, _, raw = pair.partition("=")
        try:
            out[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            out[key] = raw
    return out


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("name")
    p.add_argument("config")
    p.add_argument("--config-options", nargs="*", default=[])
    p.add_argument("--override", nargs="*", default=[])
    p.add_argument("--load-model-from", nargs="*", default=None)
    p.add_argument("--load-from", default=None)
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--work-dir", default=None)
    return p


def honor_env_platform() -> None:
    """Honor JAX_PLATFORMS explicitly: the axon TPU plugin ignores the env
    var, so "JAX_PLATFORMS=cpu ..." would silently run on (or hang waiting
    for) the TPU tunnel. The config flag is authoritative; call before any
    backend initialises."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)


def prepare(args: argparse.Namespace) -> Config:
    honor_env_platform()
    # Configure the package logger directly: jax/absl may already have
    # installed a root handler, which turns logging.basicConfig into a
    # silent no-op (root stays at WARNING and all iter logs vanish).
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    config = load_config(args.config, **parse_kv(args.config_options))
    config.override(parse_kv(args.override))
    config.setdefault("name", args.name)

    for mod in config.get("custom_imports", []) or []:
        importlib.import_module(mod)
    # built-in algorithms always register
    importlib.import_module("vector_quantization_tpu.algorithms")
    return config


def log_run(work_dir: str, config: Config) -> None:
    """Dump command/config for reproducibility (reference vq.utils.log,
    misc.py:50-63) and tee all run logs into the work dir (the reference's
    LogCallback file handler)."""
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "run.log"), "a") as f:
        f.write(" ".join(sys.argv) + "\n")
    config.dump(os.path.join(work_dir, "config.json"))
    log_file = os.path.join(work_dir, "run.log")
    if not any(
        isinstance(h, logging.FileHandler)
        and getattr(h, "baseFilename", None) == log_file
        for h in logger.handlers
    ):
        fh = logging.FileHandler(log_file)
        fh.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        )
        logger.addHandler(fh)
