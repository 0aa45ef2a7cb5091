"""Live enhancement server: TCP sessions -> BatchedStreamingEnhancer.

The reference enhances offline batches only (SURVEY.md §3.3); production
serving needs live sessions.  TPU-first: every connected session's next block
is batched into ONE jitted program per tick (streaming.BatchedStreamingEnhancer)
so concurrent streams fill the MXU instead of dispatching per-session
programs.  stdlib-only (socket + threads), so the server runs anywhere the
framework does.

Wire protocol (both directions, little-endian):
  frame  := uint32 n_bytes | n_bytes of float32 samples
  n_bytes == 0 is the end-of-stream marker.  A client streams capture audio
  as frames, sends the empty frame when done, and reads enhanced frames until
  it receives the empty frame back.  If all stream slots are busy the server
  answers a new connection with the empty frame immediately and closes.

Threading model: per-connection reader threads only BUFFER samples
(eng.feed); one ticker thread owns ALL device work (eng.step) and routes each
slot's output to its socket — the engine is never called concurrently.
"""

from __future__ import annotations

import socket
import struct
import threading

import numpy as np

from aas_enhancement_tpu.config import Config
from aas_enhancement_tpu.streaming import BatchedStreamingEnhancer

_HDR = struct.Struct("<I")


def send_frame(sock: socket.socket, samples: np.ndarray) -> None:
    data = np.ascontiguousarray(samples, np.float32).tobytes()
    sock.sendall(_HDR.pack(len(data)) + data)


def send_eos(sock: socket.socket) -> None:
    sock.sendall(_HDR.pack(0))


def recv_frame_bytes(sock: socket.socket) -> bytes | None:
    """-> one frame's payload, or None on end-of-stream / closed socket."""
    hdr = _recv_exact(sock, _HDR.size)
    if hdr is None:
        return None
    (n,) = _HDR.unpack(hdr)
    if n == 0:
        return None
    return _recv_exact(sock, n)


def recv_frame(sock: socket.socket) -> np.ndarray | None:
    """-> float32 samples, or None on end-of-stream / closed socket."""
    data = recv_frame_bytes(sock)
    return None if data is None else np.frombuffer(data, np.float32)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except OSError:
            return None
        if not chunk:
            return None
        buf += chunk
    return buf


class EnhanceServer:
    """Serve live enhancement sessions over TCP (see module docstring).

    With `am_params` the server TRANSCRIBES instead: sessions run through
    BatchedStreamingRecognizer (enhancer + AM per block) and the frames sent
    back carry UTF-8 transcript DELTAS — greedy CTC collapse is append-only
    across blocks, so the client just concatenates them."""

    def __init__(self, cfg: Config, params, host: str = "127.0.0.1",
                 port: int = 0, max_streams: int = 8,
                 chunk_seconds: float = 1.0, lookahead_seconds: float = 0.2,
                 history_seconds: float = 0.5, tick_seconds: float = 0.02,
                 am_params=None):
        self._transcribe = am_params is not None
        if self._transcribe:
            from aas_enhancement_tpu.streaming_asr import (
                BatchedStreamingRecognizer)
            self._eng = BatchedStreamingRecognizer(
                cfg, am_params, g_params=params or None,
                max_streams=max_streams, chunk_seconds=chunk_seconds,
                lookahead_seconds=lookahead_seconds,
                history_seconds=history_seconds)
            self._sent: dict[int, int] = {}   # chars already sent per slot
        else:
            self._eng = BatchedStreamingEnhancer(
                cfg, params, max_streams=max_streams,
                chunk_seconds=chunk_seconds,
                lookahead_seconds=lookahead_seconds,
                history_seconds=history_seconds)
        self._lock = threading.Lock()        # guards _eng state + _socks
        self._socks: dict[int, socket.socket] = {}
        self._tick = tick_seconds
        self._stop = threading.Event()
        self._srv = socket.create_server((host, port))
        self.address = self._srv.getsockname()
        self._threads: list[threading.Thread] = []

    def start(self) -> "EnhanceServer":
        for fn in (self._accept_loop, self._tick_loop):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        self._srv.close()
        for t in self._threads:
            t.join(timeout=5.0)
        with self._lock:
            for sock in self._socks.values():
                sock.close()
            self._socks.clear()

    # ------------------------------------------------------------- internals
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return                        # server socket closed
            with self._lock:
                try:
                    slot = self._eng.open()
                except RuntimeError:
                    slot = None               # full: refuse politely
                if slot is not None:
                    self._socks[slot] = sock
                    if self._transcribe:
                        self._sent[slot] = 0
            if slot is None:
                try:
                    send_eos(sock)
                finally:
                    sock.close()
                continue
            t = threading.Thread(target=self._reader, args=(slot, sock),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def _reader(self, slot: int, sock: socket.socket) -> None:
        while True:
            samples = recv_frame(sock)
            with self._lock:
                # Identity check: the ticker may have closed this slot and a
                # NEW session reused the id — never feed someone else's stream.
                if self._socks.get(slot) is not sock:
                    return
                if samples is None:
                    self._eng.end_stream(slot)
                    return
                self._eng.feed(slot, samples)

    def _tick_loop(self) -> None:
        while not self._stop.is_set():
            with self._lock:
                out = self._eng.step()
                if self._transcribe:
                    # Replace id frames with the UTF-8 transcript delta.
                    deltas = {}
                    for s in out:
                        text = self._eng.transcript(s)
                        deltas[s] = text[self._sent.get(s, 0):]
                        self._sent[s] = len(text)
                    out = deltas
                done = [s for s in list(self._socks)
                        if self._eng.is_done(s)]
                socks = {s: self._socks[s] for s in (*out, *done)
                         if s in self._socks}
                for s in done:
                    self._eng.close(s)
                    self._socks.pop(s, None)
                    if self._transcribe:
                        self._sent.pop(s, None)
            # Socket IO outside the lock: a slow client must not stall the
            # engine for everyone else beyond its own backlog.
            for s, payload in out.items():
                if s not in socks:
                    continue
                try:
                    if self._transcribe:
                        if payload:           # skip empty deltas
                            data = payload.encode("utf-8")
                            socks[s].sendall(_HDR.pack(len(data)) + data)
                    else:
                        send_frame(socks[s], payload)
                except OSError:
                    pass                      # client went away mid-stream
            for s in done:
                if s in socks:
                    try:
                        send_eos(socks[s])
                    except OSError:
                        pass
                    socks[s].close()
            if not out:
                self._stop.wait(self._tick)


def enhance_via_server(address, samples: np.ndarray,
                       push: int = 4000) -> np.ndarray:
    """Client helper: stream a waveform to a running server, return the
    enhanced audio (blocks until the server's end-of-stream)."""
    sock = socket.create_connection(address)
    try:
        # Writer thread so server output is drained while we push (no
        # deadlock when both directions fill their buffers).
        def _push():
            for i in range(0, len(samples), push):
                send_frame(sock, samples[i: i + push])
            send_eos(sock)
        w = threading.Thread(target=_push, daemon=True)
        w.start()
        outs = []
        while (frame := recv_frame(sock)) is not None:
            outs.append(frame)
        w.join(timeout=5.0)
    finally:
        sock.close()
    return (np.concatenate(outs) if outs else np.zeros(0, np.float32))


def transcribe_via_server(address, samples: np.ndarray,
                          push: int = 4000) -> str:
    """Client helper for a transcribe-mode server: stream a waveform, return
    the final transcript (concatenated UTF-8 deltas)."""
    sock = socket.create_connection(address)
    try:
        def _push():
            for i in range(0, len(samples), push):
                send_frame(sock, samples[i: i + push])
            send_eos(sock)
        w = threading.Thread(target=_push, daemon=True)
        w.start()
        parts = []
        while (data := recv_frame_bytes(sock)) is not None:
            parts.append(data.decode("utf-8"))
        w.join(timeout=5.0)
    finally:
        sock.close()
    return "".join(parts)
