"""Per-scale-factor scratch locations for gate queries.

ADVICE r3: several queries used FIXED paths (``/tmp/cptc_codec_rt``)
and fixed warehouse table names; two concurrent gate runs or a
parallel scale-factor sweep would silently clobber each other and
produce wrong counts instead of clean failures. Every scratch
location is therefore keyed by a hash of the ``sf_dir`` it was
computed from (the pattern ``binaryfile_ingest`` already used), plus
an optional ``SPARK_GRAFT_SCRATCH_TOKEN`` env var when a caller
needs full run isolation at the same scale factor (e.g. two CI
lanes over sf0.01).
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def _tag(sf_dir: str) -> str:
    token = os.environ.get("SPARK_GRAFT_SCRATCH_TOKEN", "")
    return hashlib.md5((sf_dir + "|" + token).encode()).hexdigest()[:8]


def scratch_dir(sf_dir: str, name: str, *parts: str) -> str:
    """A tmp directory unique to (name, sf_dir[, token]).

    Callers own lifecycle (most rmtree+recreate so stale files from a
    regenerated fixture can't leak into a scan)."""
    return os.path.join(
        tempfile.gettempdir(), f"cptc_{name}_{_tag(sf_dir)}", *parts
    )


def scratch_table(sf_dir: str, name: str) -> str:
    """A warehouse table name unique to (name, sf_dir[, token])."""
    return f"{name}_{_tag(sf_dir)}"
