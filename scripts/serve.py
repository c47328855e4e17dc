#!/usr/bin/env python
"""Online enhancement server over a trained DR-NMF checkpoint.

Production-style streaming serving (the real-time counterpart of
``enhance_wav.py``): loads a model config YAML + checkpoint and serves a
bounded-latency :class:`drnmf_tpu.StreamingEnhancer` per connection over a
length-prefixed TCP protocol. The concatenated enhanced stream equals the
offline pipeline's output exactly (the streaming cell is the offline cell;
see ``drnmf_tpu/streaming.py``).

Protocol (all little-endian):
    client -> server:  int32 n, then n float32 mono samples; repeat.
                       n == 0 requests a flush-and-close.
    server -> client:  int32 m, then the m float32 samples that became
                       final (m may be 0 while latency fills); after the
                       flush reply the connection closes.

Usage:
    python scripts/serve.py -c params_unfolded_snmf_<hash>.yaml \\
        -m model_unfolded_snmf_<hash>.npz --port 7355 [--block-frames 16]

Connections are served sequentially (one TPU program stream); each
connection gets a fresh enhancer state.
"""

import argparse
import os
import socket
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _recv_exact(conn, n):
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed mid-message")
        buf += chunk
    return buf


def _send_samples(conn, samples):
    samples = np.asarray(samples, np.float32)
    conn.sendall(struct.pack("<i", samples.size) + samples.tobytes())


# a single message is bounded to a few seconds of 16 kHz audio: a client
# int32 can otherwise demand an ~8 GB recv buffer and wedge the sequential
# server (ADVICE r2)
MAX_CHUNK_SAMPLES = 10 * 16000
RECV_TIMEOUT_S = 30.0


def serve_connection(conn, make_enhancer_state,
                     max_chunk=MAX_CHUNK_SAMPLES, timeout=RECV_TIMEOUT_S):
    """One client session: fresh enhancer, stream until the flush request.

    Oversize chunk lengths are rejected (connection dropped with an error)
    and a recv timeout bounds how long a stalled client can hold the
    sequential single-connection server."""
    if timeout:
        conn.settimeout(timeout)
    enh = make_enhancer_state()
    while True:
        (n,) = struct.unpack("<i", _recv_exact(conn, 4))
        if n < 0:
            raise ValueError(f"negative chunk length {n}")
        if n > max_chunk:
            raise ValueError(
                f"chunk length {n} exceeds the {max_chunk}-sample cap")
        if n == 0:
            _send_samples(conn, enh.flush())
            return
        data = np.frombuffer(_recv_exact(conn, 4 * n), dtype="<f4")
        _send_samples(conn, enh.process(data))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-c", "--config", required=True, help="model YAML")
    parser.add_argument("-m", "--model", required=True, help="checkpoint .npz")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7355)
    parser.add_argument("--n-fft", type=int, default=512)
    parser.add_argument("--hop", type=int, default=128)
    parser.add_argument("--block-frames", type=int, default=16,
                        help="frames per device step; latency is "
                        "(block_frames-1)*hop + n_fft samples")
    parser.add_argument("--max-connections", type=int, default=0,
                        help="exit after N connections (0 = serve forever)")
    args = parser.parse_args()

    from drnmf_tpu import StreamingEnhancer
    from drnmf_tpu.pipeline import drnmf_config_from_params
    from drnmf_tpu.train import load_checkpoint
    from drnmf_tpu.utils import load_yaml, enable_compile_cache

    enable_compile_cache()
    cfg = load_yaml(args.config)
    config = drnmf_config_from_params(cfg, args.n_fft // 2 + 1)
    params, _ = load_checkpoint(args.model)
    from drnmf_tpu.models.drnmf import ensure_fold_valid

    config = ensure_fold_valid(config, params)

    def fresh():
        return StreamingEnhancer(params, config, n_fft=args.n_fft,
                                 hop=args.hop,
                                 block_frames=args.block_frames)

    # compile up front so the first client doesn't pay the jit wall
    warm = fresh()
    warm.process(np.zeros(warm.latency_samples, np.float32))

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((args.host, args.port))
    srv.listen(1)
    lat_ms = 1000.0 * warm.latency_samples / 16000
    print(f"serving on {args.host}:{srv.getsockname()[1]} "
          f"(block_frames={args.block_frames}, latency {lat_ms:.0f} ms "
          f"@16kHz)", flush=True)

    served = 0
    try:
        while args.max_connections == 0 or served < args.max_connections:
            conn, addr = srv.accept()
            try:
                serve_connection(conn, fresh)
            except (ConnectionError, ValueError, socket.timeout) as e:
                print(f"connection {addr}: {e}", flush=True)
            finally:
                conn.close()
            served += 1
    finally:
        srv.close()


if __name__ == "__main__":
    main()
