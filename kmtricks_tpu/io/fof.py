"""Input manifest ("fof") parser.

Grammar (reference include/kmtricks/io/fof.hpp:39-44):
``ID : path1 ; path2 ! abundance_min`` per line — an identifier
([A-Za-z0-9_-]+), a colon, one or more ';'-separated paths, and an optional
``! <int>`` per-sample hard abundance minimum (0 = use the global default).
Sample identifiers must be unique; ``[<>{},[\\]]`` anywhere invalidates the
line. Column order of every matrix equals fof line order.
"""

from __future__ import annotations

import re
import shutil
from dataclasses import dataclass

PATTERN = re.compile(
    r"(^[A-Za-z0-9_-]+)\s*:\s*([.A-Za-z0-9/_\-; ]+)(\s*!\s*)?([0-9]+$)?")
INVALID = re.compile(r"[<>{},\[\]]")


@dataclass
class FofEntry:
    id: str
    paths: list[str]
    abundance_min: int  # 0 = unset (use global default)


class Fof:
    def __init__(self, entries: list[FofEntry], path: str | None = None):
        self.entries = entries
        self.path = path
        self._index = {e.id: i for i, e in enumerate(entries)}

    @classmethod
    def parse(cls, path: str) -> "Fof":
        entries: list[FofEntry] = []
        seen: set[str] = set()
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                g = PATTERN.search(line)
                if not g or INVALID.search(line):
                    raise IOError("Invalid fof format.")
                ident = g.group(1)
                if ident in seen:
                    raise IOError(
                        f"{ident} -> sample identifiers must be unique.")
                seen.add(ident)
                paths = [p.strip() for p in g.group(2).split(";")]
                amin = int(g.group(4)) if g.group(4) else 0
                entries.append(FofEntry(ident, paths, amin))
        return cls(entries, path)

    def copy(self, dest: str) -> None:
        if self.path:
            shutil.copyfile(self.path, dest)
        else:
            self.write(dest)

    def write(self, dest: str) -> None:
        with open(dest, "w") as f:
            for e in self.entries:
                line = f"{e.id} : {' ; '.join(e.paths)}"
                if e.abundance_min:
                    line += f" ! {e.abundance_min}"
                f.write(line + "\n")

    # -- accessors (fof.hpp:56-105) -----------------------------------------

    def __len__(self) -> int:
        return len(self.entries)

    def __iter__(self):
        return iter(self.entries)

    def ids(self) -> list[str]:
        return [e.id for e in self.entries]

    def get_i(self, ident: str) -> int:
        if ident not in self._index:
            raise KeyError(f"Unknown id: {ident}")
        return self._index[ident]

    def get_files(self, ident: str) -> list[str]:
        return self.entries[self.get_i(ident)].paths

    def get_all(self) -> list[str]:
        return [p for e in self.entries for p in e.paths]

    def total(self) -> int:
        return sum(len(e.paths) for e in self.entries)

    def abundance_mins(self, default: int) -> list[int]:
        """Per-sample hard-min vector: the per-line override or the global
        default (cli.cpp --hard-min + fof ! syntax)."""
        return [e.abundance_min if e.abundance_min else default
                for e in self.entries]
