"""Embedded InterPro metadata: Pfam accession → entry, GO terms, GO families.

Behavioral reference: ``/root/reference/gecco/interpro/__init__.py:20-83``.
The reference ships an ``interpro.json`` resource (a git-LFS blob missing
from the mounted checkout); this loader reads the same JSON layout from
``gecco_tpu/data/interpro.json`` when present and degrades to an empty
database otherwise, so annotation still works (without GO metadata).
"""

import gzip
import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

__all__ = ["GOTerm", "InterProEntry", "InterPro"]

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@dataclass
class GOTerm:
    """A single Gene Ontology term."""

    accession: str
    name: str
    namespace: str

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, type(self)):
            return NotImplemented
        return (
            self.accession == other.accession
            and self.name == other.name
            and self.namespace == other.namespace
        )

    def __hash__(self) -> int:
        return hash((type(self), self.accession, self.name, self.namespace))


@dataclass
class InterProEntry:
    """A single InterPro entry with its member signatures and GO metadata."""

    accession: str
    members: List[str]
    name: str
    databases: List[str]
    type: str
    go_terms: List[GOTerm]
    go_functions: List[GOTerm]


class InterPro:
    """A queryable subset of the InterPro database."""

    def __init__(self, entries: List[InterProEntry]) -> None:
        self.entries = entries
        self.by_accession: Dict[str, InterProEntry] = {
            member: entry for entry in entries for member in entry.members
        }

    @classmethod
    def load(cls, path: Optional[str] = None) -> "InterPro":
        """Load the embedded metadata, or an empty database if absent."""
        if path is None:
            for candidate in ("interpro.json", "interpro.json.gz"):
                candidate_path = os.path.join(_DATA_DIR, candidate)
                if os.path.exists(candidate_path):
                    path = candidate_path
                    break
        if path is None or not os.path.exists(path):
            return cls([])
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as f:  # type: ignore[operator]
            data = json.load(f)
        entries = []
        for raw in data:
            go_terms = [GOTerm(**t) for t in raw.pop("go_terms")]
            go_functions = [
                GOTerm(**t, namespace="molecular_function")
                for t in raw.pop("go_functions")
            ]
            entries.append(InterProEntry(**raw, go_terms=go_terms, go_functions=go_functions))
        return cls(entries)
