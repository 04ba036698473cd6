"""Shared file-IO helpers."""

from __future__ import annotations

import os
import tempfile


def atomic_write(path: str, data: bytes) -> None:
    """Write-then-rename so readers never see a partial file.

    The temp file lives in the destination directory (``os.replace`` must not
    cross filesystems) and is re-chmodded from mkstemp's 0600 to normal file
    permissions before publishing. One definition for every artifact writer
    (train/checkpoint.py snapshots, serve.py artifacts) so the atomicity /
    cleanup dance cannot drift between copies.
    """
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.chmod(tmp, 0o644)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
