"""Byte-range sources: the network layer feeding the stream buffer.

The framework analog of the reference's ``ez_http`` loader
(``features/http.js:109-143``): ranged, chunked, cancellable requests with
``on_data(start, data, total)`` callbacks.  Three implementations:

* :class:`MemorySource` — in-memory bytes (tests, already-loaded files);
* :class:`FileSource`   — local file with optional thread-async delivery;
* :class:`HttpSource`   — HTTP(S) Range requests over urllib.
"""

from __future__ import annotations

import os
import threading
import urllib.request
from dataclasses import dataclass


class ByteSource:
    """Interface: ranged chunked loading with cancellation."""

    def total_length(self) -> int | None:
        raise NotImplementedError

    def request(self, start: int, end: int | None, on_data,
                on_error=None, on_complete=None, chunk_size: int = 300000):
        """Fetch [start, end] (inclusive; None = to EOS).  Delivers
        ``on_data(start, bytes, total)`` per chunk.  Returns a cancel
        handle."""
        raise NotImplementedError

    def cancel(self, handle) -> None:
        raise NotImplementedError


class _CancelFlag:
    def __init__(self):
        self.cancelled = False


class MemorySource(ByteSource):
    """Bytes already in memory; sync or async chunked delivery."""

    def __init__(self, data: bytes, async_delivery: bool = False,
                 latency_s: float = 0.0):
        self._data = bytes(data)
        self._async = async_delivery
        self._latency = latency_s

    def total_length(self) -> int | None:
        return len(self._data)

    def _pump(self, start, end, on_data, on_complete, chunk, flag):
        import time

        total = len(self._data)
        end = total - 1 if end is None else min(end, total - 1)
        pos = start
        while pos <= end and not flag.cancelled:
            if self._latency:
                time.sleep(self._latency)
            n = min(chunk, end - pos + 1)
            on_data(pos, self._data[pos:pos + n], total)
            pos += n
        if on_complete and not flag.cancelled:
            on_complete()

    def request(self, start, end, on_data, on_error=None, on_complete=None,
                chunk_size: int = 300000):
        flag = _CancelFlag()
        if self._async:
            t = threading.Thread(
                target=self._pump,
                args=(start, end, on_data, on_complete, chunk_size, flag),
                daemon=True)
            t.start()
        else:
            self._pump(start, end, on_data, on_complete, chunk_size, flag)
        return flag

    def cancel(self, handle) -> None:
        handle.cancelled = True


class FileSource(ByteSource):
    def __init__(self, path: str, async_delivery: bool = True):
        self._path = path
        self._size = os.path.getsize(path)
        self._async = async_delivery

    def total_length(self) -> int | None:
        return self._size

    def _pump(self, start, end, on_data, on_error, on_complete, chunk, flag):
        try:
            end = self._size - 1 if end is None else min(end, self._size - 1)
            with open(self._path, "rb") as f:
                f.seek(start)
                pos = start
                while pos <= end and not flag.cancelled:
                    n = min(chunk, end - pos + 1)
                    data = f.read(n)
                    if not data:
                        break
                    on_data(pos, data, self._size)
                    pos += len(data)
            if on_complete and not flag.cancelled:
                on_complete()
        except Exception as e:             # pragma: no cover
            if on_error:
                on_error(e)

    def request(self, start, end, on_data, on_error=None, on_complete=None,
                chunk_size: int = 300000):
        flag = _CancelFlag()
        args = (start, end, on_data, on_error, on_complete, chunk_size, flag)
        if self._async:
            threading.Thread(target=self._pump, args=args,
                             daemon=True).start()
        else:
            self._pump(*args)
        return flag

    def cancel(self, handle) -> None:
        handle.cancelled = True


class HttpSource(ByteSource):
    """Ranged HTTP fetches (Range: bytes=s-e), streamed in chunks."""

    def __init__(self, url: str, timeout: float = 30.0):
        self._url = url
        self._timeout = timeout
        self._total: int | None = None

    def total_length(self) -> int | None:
        if self._total is None:
            req = urllib.request.Request(self._url, method="HEAD")
            try:
                with urllib.request.urlopen(req,
                                            timeout=self._timeout) as resp:
                    cl = resp.headers.get("Content-Length")
                    self._total = int(cl) if cl else None
            except Exception:
                self._total = None
        return self._total

    def _pump(self, start, end, on_data, on_error, on_complete, chunk, flag):
        try:
            rng = f"bytes={start}-" + ("" if end is None else str(end))
            req = urllib.request.Request(self._url, headers={"Range": rng})
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                total = self._total
                cr = resp.headers.get("Content-Range")
                if cr and "/" in cr:
                    try:
                        total = int(cr.rsplit("/", 1)[1])
                        self._total = total
                    except ValueError:
                        pass
                pos = start
                while not flag.cancelled:
                    data = resp.read(chunk)
                    if not data:
                        break
                    on_data(pos, data, total or 0)
                    pos += len(data)
            if on_complete and not flag.cancelled:
                on_complete()
        except Exception as e:
            if on_error:
                on_error(e)

    def request(self, start, end, on_data, on_error=None, on_complete=None,
                chunk_size: int = 300000):
        flag = _CancelFlag()
        threading.Thread(
            target=self._pump,
            args=(start, end, on_data, on_error, on_complete, chunk_size,
                  flag),
            daemon=True).start()
        return flag

    def cancel(self, handle) -> None:
        handle.cancelled = True


class ChaosSource(ByteSource):
    """Fault-injection wrapper for resilience testing: drops a fraction
    of chunks, delays others, and can fail whole requests — exercising
    the stall/refill and error paths the way flaky networks do."""

    def __init__(self, inner: ByteSource, drop_rate: float = 0.0,
                 error_rate: float = 0.0, delay_s: float = 0.0, seed: int = 0):
        import random

        self._inner = inner
        self._rng = random.Random(seed)
        self.drop_rate = drop_rate
        self.error_rate = error_rate
        self.delay_s = delay_s

    def total_length(self):
        return self._inner.total_length()

    def request(self, start, end, on_data, on_error=None, on_complete=None,
                chunk_size: int = 300000):
        import time as _t

        if self._rng.random() < self.error_rate:
            if on_error:
                on_error(IOError("injected network error"))
            return _CancelFlag()

        def wrapped(s, d, t):
            if self._rng.random() < self.drop_rate:
                return                      # lost chunk -> future stall
            if self.delay_s:
                _t.sleep(self.delay_s)
            on_data(s, d, t)

        return self._inner.request(start, end, wrapped, on_error,
                                   on_complete, chunk_size)

    def cancel(self, handle):
        self._inner.cancel(handle)


def source_for(src: str | bytes) -> ByteSource:
    """src string/bytes -> appropriate ByteSource."""
    if isinstance(src, (bytes, bytearray)):
        return MemorySource(bytes(src))
    if src.startswith("http://") or src.startswith("https://"):
        return HttpSource(src)
    return FileSource(src)
