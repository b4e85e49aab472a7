"""Merge plugin system.

Reference: include/kmtricks/plugin.hpp + plugin_manager.hpp — a dlopen'd
``IMergePlugin`` whose ``process_kmer``/``process_hash`` OVERRIDES the
recurrence keep-verdict for every merged row and may modify the count vector
in place. Here a plugin is a Python file (or importable module) exposing a
subclass of :class:`MergePlugin`; load spec ``path.py[:ClassName]`` via
``--plugin`` / ``--plugin-config`` exactly like the reference CLI.

For throughput a plugin may implement the vectorized ``process_batch``
(keys, counts) -> keep mask; otherwise the per-row hooks are called.
"""

from __future__ import annotations

import importlib
import importlib.util
import inspect

import numpy as np


class MergePlugin:
    """Base class (mirrors IMergePlugin, plugin.hpp:12-30)."""

    output_directory: str = ""
    kmer_size: int = 0
    partition: int = 0

    def set_out_dir(self, s: str) -> None:
        self.output_directory = s

    def set_partition(self, p: int) -> None:
        self.partition = p

    def set_kmer_size(self, k: int) -> None:
        self.kmer_size = k

    def configure(self, s: str) -> None:
        pass

    def process_kmer(self, kmer_data: np.ndarray,
                     count_vector: np.ndarray) -> bool:
        return True

    def process_hash(self, h: int, count_vector: np.ndarray) -> bool:
        return True

    # Optional vectorized fast path: (keys (N,S)|(N,), counts (N,C)) -> keep
    process_batch = None


def load_plugin(spec: str, config: str = "") -> MergePlugin:
    """Load ``file.py[:ClassName]`` or ``module[:ClassName]``."""
    path, _, cls_name = spec.partition(":")
    if path.endswith(".py"):
        mod_spec = importlib.util.spec_from_file_location("km_plugin", path)
        mod = importlib.util.module_from_spec(mod_spec)
        mod_spec.loader.exec_module(mod)
    else:
        mod = importlib.import_module(path)
    if cls_name:
        cls = getattr(mod, cls_name)
    else:
        candidates = [c for _, c in inspect.getmembers(mod, inspect.isclass)
                      if issubclass(c, MergePlugin) and c is not MergePlugin]
        if len(candidates) != 1:
            raise ValueError(
                f"{spec}: expected exactly one MergePlugin subclass, "
                f"found {len(candidates)}")
        cls = candidates[0]
    plugin = cls()
    plugin.configure(config)
    return plugin


def apply_plugin(plugin: MergePlugin, keys: np.ndarray, counts: np.ndarray,
                 is_hash: bool) -> np.ndarray:
    """Run the hook on every merged row; counts may be modified in place.
    Returns the new keep mask (the plugin verdict REPLACES the recurrence
    one, merge.hpp:252-257)."""
    if plugin.process_batch is not None:
        return np.asarray(plugin.process_batch(keys, counts), dtype=bool)
    keep = np.zeros(len(counts), dtype=bool)
    if is_hash:
        flat = np.asarray(keys).ravel()
        for i in range(len(counts)):
            keep[i] = plugin.process_hash(int(flat[i]), counts[i])
    else:
        rows = np.atleast_2d(keys)
        for i in range(len(counts)):
            keep[i] = plugin.process_kmer(rows[i], counts[i])
    return keep
