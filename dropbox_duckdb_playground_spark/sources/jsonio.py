"""JSON object store (S3): small config/training artifacts as plain JSON
files — the reference's `JsonStorage` (batch_framework/storage.py:77-112),
used there for dedupe training data. Driver-side IO; tables go through
Parquet, never this."""

from __future__ import annotations

import json
import os
from typing import Any


def write_json_obj(obj: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(obj, f, ensure_ascii=False, sort_keys=True)


def read_json_obj(path: str) -> Any:
    with open(path, encoding="utf-8") as f:
        return json.load(f)
