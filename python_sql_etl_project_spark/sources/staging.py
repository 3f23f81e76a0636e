"""Landing-zone staging: fetch a remote object to local storage (S3 parity).

The reference downloads its Excel workbook from a remote folder before
extraction (``/root/reference/src/extract.py:46-83``: look the file up,
stream it to ``local_path``, return success) and the pipeline degrades
gracefully when the fetch fails. SURVEY §2.1 scopes the provider SDK out
of the engine — staging is a landing-zone concern that runs ONCE on one
node, not a distributed operator — but the semantics belong here:

* idempotent: an already-staged file is reused (size-checked), so a
  re-run doesn't re-download the corpus;
* atomic: downloads go to a ``.part`` temp name and rename into place —
  a crashed fetch never leaves a half-written file a Spark scan could
  read;
* graceful: any failure returns ``None`` (the all-or-nothing extract
  contract), never raises into the pipeline.

Supported schemes: bare local paths, ``file://`` and ``http(s)://`` via
the standard library. An object-store or Drive-style source plugs in by
passing ``opener=`` — the reference's lookup-then-stream maps onto it
directly; no provider SDK is imported here.
"""

from __future__ import annotations

import hashlib
import logging
import os
import shutil
import urllib.request
from collections.abc import Callable
from typing import BinaryIO

logger = logging.getLogger(__name__)

_CHUNK = 1 << 20


def _open_source(url: str) -> BinaryIO:
    if url.startswith(("http://", "https://", "file://")):
        return urllib.request.urlopen(url)  # noqa: S310 - scheme-checked
    return open(url, "rb")


def stage_file(
    source: str,
    landing_dir: str,
    file_name: str | None = None,
    overwrite: bool = False,
    opener: Callable[[str], BinaryIO] | None = None,
) -> str | None:
    """Stage ``source`` into ``landing_dir``; return the local path or
    ``None`` on failure (the reference's bool contract, path-valued).

    ``opener`` lets callers inject a provider client (object store,
    Drive, ...) that returns a readable binary stream for ``source``.
    """
    name = file_name or os.path.basename(source.rstrip("/")) or "staged.bin"
    os.makedirs(landing_dir, exist_ok=True)
    dest = os.path.join(landing_dir, name)

    if os.path.exists(dest) and not overwrite:
        logger.info("stage: %s already present (%d bytes), reusing",
                    dest, os.path.getsize(dest))
        return dest

    tmp = dest + ".part"
    digest = hashlib.md5()
    try:
        with (opener or _open_source)(source) as src, open(tmp, "wb") as out:
            while True:
                chunk = src.read(_CHUNK)
                if not chunk:
                    break
                digest.update(chunk)
                out.write(chunk)
        os.replace(tmp, dest)  # atomic on POSIX
    except Exception:
        logger.exception("stage: fetch failed for %s", source)
        if os.path.exists(tmp):
            os.unlink(tmp)
        return None

    logger.info("stage: %s -> %s (%d bytes, md5=%s)",
                source, dest, os.path.getsize(dest), digest.hexdigest())
    return dest


def stage_sources(
    sources: dict[str, str],
    landing_dir: str,
    opener: Callable[[str], BinaryIO] | None = None,
) -> dict[str, str] | None:
    """Stage every named source; all-or-nothing like the reference's
    extract step (one missing source aborts the batch,
    ``/root/reference/src/extract.py:130-158``)."""
    staged: dict[str, str] = {}
    for name, url in sources.items():
        path = stage_file(url, landing_dir, file_name=name, opener=opener)
        if path is None:
            logger.error("stage: aborting batch, %s unavailable", name)
            return None
        staged[name] = path
    return staged
