"""HTTP source with retry (SURVEY §2.1 S1-S3).

Reference parity: ``download_file`` (data_extractor.py:35-91) — streamed
download, 3 retries with exponential backoff ``2**attempt`` seconds,
60 s timeout, 8 KiB chunks — plus the named-source registry
(data_extractor.py:93-123) binding config URLs to dated filenames.

Architecture note: HTTP ingest is DRIVER-SIDE by design. At 100 TB the
pattern is land-then-scan — fetch to object storage (this module, or an
external loader), then ``spark.read`` the landed files so the scan is
distributed; Spark executors never do the HTTP fetch themselves.

``requests`` is optional (import-gated): ``urllib`` is the stdlib
fallback, keeping the module importable in slim containers.
"""

from __future__ import annotations

import time
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

try:  # pragma: no cover - environment-dependent
    import requests

    _HAVE_REQUESTS = True
except ImportError:  # pragma: no cover
    requests = None
    _HAVE_REQUESTS = False

CHUNK_SIZE = 8192


def download_file(
    url: str,
    filename: str | Path,
    timeout: int = 60,
    retries: int = 3,
    sleep: Callable[[float], None] = time.sleep,
) -> Path | None:
    """Stream ``url`` to ``filename`` with retry + exponential backoff.

    Returns the path on success, None after exhausting retries
    (reference contract: data_extractor.py:35-91; backoff 2**attempt).
    """
    target = Path(filename)
    target.parent.mkdir(parents=True, exist_ok=True)
    for attempt in range(retries):
        try:
            if _HAVE_REQUESTS:
                with requests.get(url, stream=True, timeout=timeout) as resp:
                    resp.raise_for_status()
                    with open(target, "wb") as fh:
                        for chunk in resp.iter_content(chunk_size=CHUNK_SIZE):
                            if chunk:
                                fh.write(chunk)
            else:
                with urllib.request.urlopen(url, timeout=timeout) as resp, open(
                    target, "wb"
                ) as fh:
                    while chunk := resp.read(CHUNK_SIZE):
                        fh.write(chunk)
            return target
        except Exception:
            if attempt + 1 >= retries:
                return None
            sleep(2**attempt)
    return None


@dataclass(frozen=True)
class NamedSource:
    """A config-bound source: URL + filename pattern with a date slot
    (data_extractor.py:93-123)."""

    name: str
    url: str
    filename_pattern: str  # e.g. "owid_covid_data_{date}.csv"

    def filename_for(self, date_str: str) -> str:
        return self.filename_pattern.format(date=date_str)


class SourceRegistry:
    """Named source registry — bind once, extract by name."""

    def __init__(self) -> None:
        self._sources: dict[str, NamedSource] = {}

    def register(self, source: NamedSource) -> None:
        self._sources[source.name] = source

    def extract(
        self,
        name: str,
        out_dir: str | Path,
        date_str: str,
        **download_kwargs,
    ) -> Path | None:
        src = self._sources[name]
        return download_file(
            src.url, Path(out_dir) / src.filename_for(date_str), **download_kwargs
        )

    def names(self) -> list[str]:
        return sorted(self._sources)
