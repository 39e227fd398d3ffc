"""Deployment config + secrets resolution (SURVEY.md §2.6 O5).

The reference fetches credentials from AWS Secrets Manager — a JSON
``{src_sys_id: password}`` document or a base64 binary
(ingestion/utils/dataIngestionUtils.py:70-115) — and loads a global
JSON config (ingestion/dataIngestion.py:15, config/globalConfig.json).
The engine keeps the same two capabilities behind provider-agnostic
references, so credentials stay out of code and catalogs:

  * ``env:VAR``              → environment variable
  * ``file:/path.json#key``  → key in a JSON document (the Secrets
                               Manager SecretString shape)
  * ``b64:...``              → inline base64 (the SecretBinary branch)
  * anything else            → literal passthrough

A cloud deployment swaps ``file:`` for its secrets client; callers
(JdbcSource, Catalog) only ever see the resolved string.
"""

from __future__ import annotations

import base64
import json
import os
from typing import Any


def get_global_config(path: str) -> dict[str, Any]:
    """Global JSON config (reference get_global_config,
    dataIngestion.py:8-17)."""
    with open(path) as f:
        return json.load(f)


def resolve_secret(ref: str) -> str:
    """Resolve a secret reference to its value (see module docstring)."""
    if ref.startswith("env:"):
        var = ref[4:]
        if var not in os.environ:
            raise KeyError(f"secret env var not set: {var}")
        return os.environ[var]
    if ref.startswith("file:"):
        loc = ref[5:]
        path, _, key = loc.partition("#")
        with open(path) as f:
            doc = json.load(f)
        if key:
            if key not in doc:
                raise KeyError(f"secret key {key!r} not in {path}")
            return str(doc[key])
        return json.dumps(doc)
    if ref.startswith("b64:"):
        return base64.b64decode(ref[4:]).decode("utf-8")
    return ref
