"""Small shared helpers (atomic local-FS writes for manifests/segments).

On a prod cluster these writes target HDFS/S3 through the same
write-temp-then-rename pattern (S3: write-then-complete multipart); tasks are
idempotent because content is deterministic, so speculative/retried attempts
racing on the rename are harmless (last-writer-wins with identical bytes).
"""

from __future__ import annotations

import json
import os
import uuid


def atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_write_json(path: str, obj: dict) -> None:
    atomic_write_bytes(path, json.dumps(obj, sort_keys=True).encode())


def read_json(path: str) -> dict:
    with open(path, "rb") as f:
        return json.loads(f.read())
