"""Micro-batching server tests (serving.py): correctness of the fan-in /
fan-out, actual coalescing under concurrency, shape isolation, error
containment, and the npz HTTP front-end."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from av_separation_tpu.config import DataConfig, ModelConfig
from av_separation_tpu.inference import Separator
from av_separation_tpu.models.model import AVSeparationTransformer
from av_separation_tpu.serving import (BatchingSeparatorServer,
                                       make_http_server)

CFG = ModelConfig(freq_bins=65, d_model=32, nhead=2, num_encoder_layers=1,
                  num_fusion_layers=1, num_speakers=2, dropout=0.0)
DCFG = DataConfig(sample_rate=2000, duration=1.0, n_fft=128, hop_length=64,
                  num_frames=5, frame_h=16, frame_w=16)


@pytest.fixture(scope="module")
def separator():
    model = AVSeparationTransformer(CFG)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 65, DCFG.num_stft_frames)),
        jnp.zeros((1, 2 * 5, 16, 16)))
    return Separator(CFG, dict(variables), DCFG)


def _req(seed, t=DCFG.num_stft_frames):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(65, t)).astype(np.float32) ** 2,
            rng.uniform(size=(10, 16, 16)).astype(np.float32))


class TestBatchingServer:
    def test_results_match_direct_separator(self, separator):
        server = BatchingSeparatorServer(separator, max_batch=8,
                                         max_delay_ms=20.0)
        try:
            mixed, lips = _req(0)
            sep_srv, masks_srv = server.separate(mixed, lips)
            sep_dir, masks_dir = separator.separate(mixed[None], lips[None])
            np.testing.assert_allclose(sep_srv, sep_dir[0], atol=1e-5)
            np.testing.assert_allclose(masks_srv, masks_dir[0], atol=1e-5)
        finally:
            server.close()

    def test_concurrent_requests_coalesce(self, separator):
        server = BatchingSeparatorServer(separator, max_batch=16,
                                         max_delay_ms=200.0)
        try:
            n = 8
            results = [None] * n
            direct = []
            for i in range(n):
                m, l = _req(i)
                direct.append(separator.separate(m[None], l[None])[0][0])

            def worker(i):
                m, l = _req(i)
                results[i] = server.separate(m, l)[0]

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(n)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
            for i in range(n):
                np.testing.assert_allclose(results[i], direct[i], atol=1e-5)
            # the whole point: these must NOT have run as 8 batches of 1
            assert server.stats.max_batch_seen >= 2
            assert server.stats.batches < n
        finally:
            server.close()

    def test_mixed_shapes_are_isolated(self, separator):
        server = BatchingSeparatorServer(separator, max_batch=8,
                                         max_delay_ms=50.0)
        try:
            m1, l1 = _req(1)
            m2, l2 = _req(2, t=DCFG.num_stft_frames + 7)
            out = [None, None]

            def w(i, m, l):
                out[i] = server.separate(m, l)

            ts = [threading.Thread(target=w, args=(0, m1, l1)),
                  threading.Thread(target=w, args=(1, m2, l2))]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=60)
            assert out[0][0].shape == (2, 65, DCFG.num_stft_frames)
            assert out[1][0].shape == (2, 65, DCFG.num_stft_frames + 7)
        finally:
            server.close()

    def test_bad_request_resolves_error_without_killing_server(
            self, separator):
        server = BatchingSeparatorServer(separator, max_batch=4,
                                         max_delay_ms=5.0)
        try:
            with pytest.raises(Exception):
                server.separate(np.zeros((3, 3), np.float32),
                                np.zeros((10, 16, 16), np.float32))
            # server still alive and serving
            m, l = _req(3)
            sep, _ = server.separate(m, l)
            assert sep.shape == (2, 65, DCFG.num_stft_frames)
            assert server.stats.errors >= 1
        finally:
            server.close()


class TestWaveformBatching:
    def test_waveform_requests_coalesce_and_match_direct(self, separator):
        server = BatchingSeparatorServer(separator, max_batch=8,
                                         max_delay_ms=200.0)
        try:
            n = 4
            rng = np.random.default_rng(7)
            audios = [rng.normal(size=DCFG.num_samples_audio)
                      .astype(np.float32) for _ in range(n)]
            lips = [rng.uniform(size=(10, 16, 16)).astype(np.float32)
                    for _ in range(n)]
            direct = separator.separate_waveform(
                np.stack(audios), np.stack(lips))
            results = [None] * n

            def worker(i):
                results[i] = server.separate_waveform(audios[i], lips[i])

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(n)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
            for i in range(n):
                waves, masks = results[i]
                np.testing.assert_allclose(waves, direct["waveforms"][i],
                                           atol=1e-5)
                np.testing.assert_allclose(masks, direct["masks"][i],
                                           atol=1e-5)
            assert server.stats.max_batch_seen >= 2
        finally:
            server.close()

    def test_rank_errors_rejected_at_submit(self, separator):
        server = BatchingSeparatorServer(separator)
        try:
            with pytest.raises(ValueError, match="mixed_spec"):
                server.submit(np.zeros((2, 65, 10), np.float32),
                              np.zeros((10, 16, 16), np.float32))
            with pytest.raises(ValueError, match="mixed_audio"):
                server.submit_waveform(
                    np.zeros((2, DCFG.num_samples_audio), np.float32),
                    np.zeros((10, 16, 16), np.float32))
        finally:
            server.close()

    def test_overload_sheds_with_503_semantics(self, separator):
        import time as _time

        from av_separation_tpu.serving import ServerOverloaded

        class SlowSeparator:
            """Delegating proxy whose forward stalls, so the pending queue
            fills deterministically while batch 1 is in flight."""

            def __init__(self, inner):
                self._inner = inner
                self.data_cfg = inner.data_cfg

            def separate(self, mixed, lips):
                _time.sleep(0.5)
                return self._inner.separate(mixed, lips)

        server = BatchingSeparatorServer(SlowSeparator(separator),
                                         max_batch=1, max_delay_ms=1.0,
                                         max_pending=2)
        try:
            m, l = _req(0)
            handles = [server.submit(m, l)]  # batch 1: occupies the device
            _time.sleep(0.1)
            handles += [server.submit(m, l), server.submit(m, l)]  # fills q
            with pytest.raises(ServerOverloaded):
                server.submit(m, l)
            assert server.stats.shed >= 1
            for h in handles:  # accepted requests still complete
                sep, _ = h.result(timeout=60)
                assert sep.shape == (2, 65, DCFG.num_stft_frames)
        finally:
            server.close()

    def test_warmup_compiles_native_shapes(self, separator):
        server = BatchingSeparatorServer(separator, max_batch=8)
        try:
            n = server.warmup(batch_sizes=(1, 2), wave=True)
            assert n == 4  # 2 buckets x (spec + wave)
            keys = set(separator.compile_cache_info)
            assert ("spec", 1, 65, DCFG.num_stft_frames,
                    DCFG.total_lip_frames, 16, 16) in keys
            assert any(k[0] == "wave" and k[1] == 2 for k in keys)
        finally:
            server.close()


class TestHttpFrontend:
    def test_post_separate_and_stats(self, separator):
        batcher = BatchingSeparatorServer(separator, max_batch=4,
                                          max_delay_ms=5.0)
        httpd = make_http_server(batcher, host="127.0.0.1", port=0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            mixed, lips = _req(9)
            buf = io.BytesIO()
            np.savez(buf, mixed_spec=mixed, lip_frames=lips)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/separate", data=buf.getvalue(),
                method="POST")
            with urllib.request.urlopen(req, timeout=60) as resp:
                assert resp.status == 200
                with np.load(io.BytesIO(resp.read())) as z:
                    sep = z["separated"]
                    masks = z["masks"]
            ref, ref_masks = separator.separate(mixed[None], lips[None])
            np.testing.assert_allclose(sep, ref[0], atol=1e-5)
            np.testing.assert_allclose(masks, ref_masks[0], atol=1e-5)
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=10) as resp:
                stats = json.loads(resp.read())
            assert stats["requests"] >= 1
        finally:
            httpd.shutdown()
            batcher.close()

    def test_post_separate_waveform(self, separator):
        batcher = BatchingSeparatorServer(separator, max_batch=4,
                                          max_delay_ms=5.0)
        httpd = make_http_server(batcher, host="127.0.0.1", port=0)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            rng = np.random.default_rng(11)
            audio = rng.normal(size=DCFG.num_samples_audio) \
                .astype(np.float32)
            lips = rng.uniform(size=(10, 16, 16)).astype(np.float32)
            buf = io.BytesIO()
            np.savez(buf, mixed_audio=audio, lip_frames=lips)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/separate_waveform",
                data=buf.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=60) as resp:
                assert resp.status == 200
                with np.load(io.BytesIO(resp.read())) as z:
                    waves = z["waveforms"]
            direct = separator.separate_waveform(audio[None], lips[None])
            np.testing.assert_allclose(waves, direct["waveforms"][0],
                                       atol=1e-5)
        finally:
            httpd.shutdown()
            batcher.close()

    def test_auth_and_size_limits(self, separator):
        import urllib.error
        batcher = BatchingSeparatorServer(separator, max_batch=4,
                                          max_delay_ms=5.0)
        httpd = make_http_server(batcher, host="127.0.0.1", port=0,
                                 auth_token="sekrit",
                                 max_request_bytes=1024)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            # /healthz is never gated
            with urllib.request.urlopen(f"{base}/healthz",
                                        timeout=10) as resp:
                assert resp.status == 200
            # stats without token -> 401
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(f"{base}/stats", timeout=10)
            assert ei.value.code == 401
            # wrong token -> 401
            req = urllib.request.Request(
                f"{base}/stats",
                headers={"Authorization": "Bearer nope"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=10)
            assert ei.value.code == 401
            # right token -> 200
            req = urllib.request.Request(
                f"{base}/stats",
                headers={"Authorization": "Bearer sekrit"})
            with urllib.request.urlopen(req, timeout=10) as resp:
                assert resp.status == 200
            # oversized body -> 413 before any parsing
            big = b"x" * 4096
            req = urllib.request.Request(
                f"{base}/separate", data=big, method="POST",
                headers={"Authorization": "Bearer sekrit"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=10)
            assert ei.value.code == 413
        finally:
            httpd.shutdown()
            batcher.close()
