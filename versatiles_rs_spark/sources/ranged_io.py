"""Ranged byte access over local files OR http(s) URLs — the transport
layer that makes every index-seeking container reader (pmtiles,
versatiles) work on remote containers, the reference's remote-source
capability (versatiles serves/reads `https://.../*.versatiles` through
ranged requests; see versatiles/src/server + io data readers).

Local paths return a plain file object; URLs return a file-like whose
``read`` issues one ``Range: bytes=a-b`` request per call with bounded
retries (same 3-retry/backoff policy as sources/tilejson.py). The
container readers' access pattern is already O(1)-seeks-per-item —
header, directory, then per-task contiguous entry ranges — so the HTTP
cost is a handful of small requests plus one ranged GET per task batch,
never a full download.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request


def is_url(path: str) -> bool:
    return path.startswith(("http://", "https://"))


class HttpRangedFile:
    """Minimal file-like (seek/tell/read/context-manager) over HTTP
    ranged GETs. ``read()`` with no size reads to end-of-resource."""

    def __init__(self, url: str, timeout: float = 10.0, max_retries: int = 3):
        self.url = url
        self.timeout = timeout
        self.max_retries = max_retries
        self._pos = 0

    # -- file protocol ------------------------------------------------
    def seek(self, pos: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = pos
        elif whence == 1:
            self._pos += pos
        else:
            raise ValueError("SEEK_END unsupported over HTTP ranges")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n == 0:
            return b""
        if n < 0:
            rng = f"bytes={self._pos}-"
        else:
            rng = f"bytes={self._pos}-{self._pos + n - 1}"
        req = urllib.request.Request(self.url, headers={"Range": rng})
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    body = r.read()
                    # a server that ignores Range answers 200 with the whole
                    # resource: slice locally so semantics stay identical
                    if r.status == 200 and self._pos:
                        body = body[self._pos:]
                    if n >= 0:
                        body = body[:n]
                self._pos += len(body)
                return body
            except urllib.error.HTTPError as e:
                if e.code == 416:  # past EOF: file semantics = empty read
                    return b""
                last = e
            except urllib.error.URLError as e:
                last = e
            if attempt < self.max_retries:
                time.sleep(0.05 * (attempt + 1))
        raise last  # type: ignore[misc]

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def open_ranged(path: str):
    """Local path -> plain binary file; http(s) URL -> HttpRangedFile."""
    if is_url(path):
        return HttpRangedFile(path)
    return open(path, "rb")
