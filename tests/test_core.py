"""Core API tests (reference model: tests/test_gpuarray.py 21 tests,
test_dtypes.py 13, test_stream.py 13)."""

import numpy as np
import pytest

import pygpukit_tpu as gp
from pygpukit_tpu.core import dtypes as dt


@pytest.fixture
def rng():
    return np.random.default_rng(3)


class TestArray:
    def test_factory_shapes_dtypes(self):
        a = gp.zeros((3, 4))
        assert a.shape == (3, 4) and a.dtype.name == "float32"
        b = gp.ones((2,), dtype="bfloat16")
        assert b.dtype is dt.bfloat16
        assert np.allclose(b.to_numpy().astype(np.float32), 1.0)
        c = gp.full((2, 2), 7, dtype="int32")
        assert c.to_numpy().tolist() == [[7, 7], [7, 7]]
        d = gp.arange(5)
        assert d.to_numpy().tolist() == [0, 1, 2, 3, 4]

    def test_from_numpy_roundtrip(self, rng):
        x = rng.standard_normal((4, 5)).astype(np.float32)
        a = gp.from_numpy(x)
        np.testing.assert_array_equal(a.to_numpy(), x)
        assert a.nbytes == 80
        assert a.size == 20 and a.ndim == 2

    def test_views_and_slices(self, rng):
        x = rng.standard_normal((6, 4)).astype(np.float32)
        a = gp.from_numpy(x)
        np.testing.assert_array_equal(a.reshape(4, 6).to_numpy(),
                                      x.reshape(4, 6))
        np.testing.assert_array_equal(a.T.to_numpy(), x.T)
        np.testing.assert_array_equal(a.narrow(0, 1, 3).to_numpy(), x[1:4])
        np.testing.assert_array_equal(a.slice_rows(2, 5).to_numpy(), x[2:5])
        np.testing.assert_array_equal(a[1:3, :2].to_numpy(), x[1:3, :2])
        np.testing.assert_array_equal(a.ravel().to_numpy(), x.ravel())

    def test_astype_bf16(self, rng):
        x = rng.standard_normal((8,)).astype(np.float32)
        b = gp.from_numpy(x).astype("bfloat16")
        assert b.dtype is dt.bfloat16
        back = b.astype("float32").to_numpy()
        np.testing.assert_allclose(back, x, rtol=1e-2)

    def test_fill_and_copy(self):
        a = gp.zeros((3,))
        a.fill_(2.5)
        np.testing.assert_array_equal(a.to_numpy(), [2.5] * 3)
        b = a.copy()
        a.fill_(0.0)
        np.testing.assert_array_equal(b.to_numpy(), [2.5] * 3)

    def test_matmul_operator(self, rng):
        x = rng.standard_normal((3, 4)).astype(np.float32)
        y = rng.standard_normal((4, 2)).astype(np.float32)
        out = gp.from_numpy(x) @ gp.from_numpy(y)
        np.testing.assert_allclose(out.to_numpy(), x @ y, rtol=1e-5,
                                   atol=1e-6)

    def test_comparison_ops(self):
        a = gp.from_numpy(np.asarray([1.0, 2.0, 3.0], np.float32))
        b = gp.from_numpy(np.asarray([2.0, 2.0, 2.0], np.float32))
        assert (a < b).to_numpy().tolist() == [True, False, False]
        assert (a == b).to_numpy().tolist() == [False, True, False]

    def test_len_and_item(self):
        a = gp.from_numpy(np.asarray([5.0], np.float32))
        assert len(a) == 1
        assert a[0].item() == 5.0
        with pytest.raises(TypeError):
            len(gp.from_numpy(np.float32(1.0)))


class TestDtypes:
    def test_registry_names(self):
        for name in ("float32", "bfloat16", "float16", "int8", "int32",
                     "float8_e4m3", "float8_e5m2", "int4", "bool"):
            assert dt.to_dtype(name).name in (name, "bool")

    def test_aliases(self):
        assert dt.to_dtype("bf16") is dt.bfloat16
        assert dt.to_dtype("fp8") is dt.float8_e4m3
        assert dt.to_dtype("f32") is dt.float32

    def test_numpy_interop(self):
        assert dt.to_dtype(np.float32) is dt.float32
        assert dt.to_dtype(np.dtype("int8")) is dt.int8

    def test_itemsize(self):
        assert dt.bfloat16.itemsize == 2
        assert dt.int4.itemsize == 0.5
        assert dt.float8_e4m3.bits == 8

    def test_kinds(self):
        assert dt.float32.is_floating and not dt.float32.is_integer
        assert dt.int8.is_integer
        assert dt.bool_.kind is dt.DataTypeKind.BOOL

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            dt.to_dtype("not_a_dtype")


class TestStreams:
    def test_priorities_and_pool(self):
        from pygpukit_tpu.core.stream import Stream, StreamManager, StreamPriority
        mgr = StreamManager(n_high=1, n_low=2)
        hi = mgr.get(StreamPriority.HIGH)
        lo1 = mgr.get(StreamPriority.LOW)
        lo2 = mgr.get(StreamPriority.LOW)
        assert hi.priority == StreamPriority.HIGH
        assert lo1 is not lo2
        assert mgr.get(StreamPriority.LOW) is lo1  # round robin
        mgr.synchronize_all()

    def test_context_manager(self):
        from pygpukit_tpu.core.stream import Stream, current_stream, default_stream
        s = Stream()
        assert current_stream() is default_stream()
        with s:
            assert current_stream() is s
        assert current_stream() is default_stream()

    def test_event_timing(self):
        from pygpukit_tpu.core.stream import Event
        import time
        e1, e2 = Event(), Event()
        e1.record()
        time.sleep(0.01)
        e2.record()
        assert e1.elapsed_ms(e2) >= 5
        assert e1.elapsed_us(e2) >= 5000

    def test_unrecorded_event_raises(self):
        from pygpukit_tpu.core.stream import Event
        with pytest.raises(RuntimeError):
            Event().elapsed_ms(Event())


class TestExecutable:
    def test_capture_replay_cache(self):
        import jax.numpy as jnp
        from pygpukit_tpu.core.executable import ExecutableCache, capture
        exe = capture(lambda x: x * 3, jnp.ones((4,)), name="triple")
        out = exe.replay(jnp.ones((4,)))
        np.testing.assert_array_equal(np.asarray(out), 3.0)
        assert exe.stats.replays == 1
        assert exe.node_count > 0

        cache = ExecutableCache()
        e1 = cache.get_or_capture("k", lambda x: x + 1, jnp.ones((2,)))
        e2 = cache.get_or_capture("k", lambda x: x + 1, jnp.ones((2,)))
        assert e1 is e2
        assert cache.stats()["hits"] == 1

    def test_device_info(self):
        info = gp.get_device_info()
        assert info.num_devices >= 1
        assert info.peak_bf16_tflops > 0
        mem = gp.get_memory_info()
        assert mem.total_bytes > 0


class TestChatTemplates:
    def test_chatml(self):
        from pygpukit_tpu.llm import ChatMessage, apply_chat_template
        out = apply_chat_template(
            [ChatMessage("system", "be brief"), ChatMessage("user", "hi")],
            template="chatml")
        assert "<|im_start|>system\nbe brief<|im_end|>" in out
        assert out.endswith("<|im_start|>assistant\n")

    def test_llama3(self):
        from pygpukit_tpu.llm import apply_chat_template
        out = apply_chat_template(
            [{"role": "user", "content": "hi"}], template="llama3")
        assert "<|start_header_id|>user<|end_header_id|>" in out

    def test_llama2_and_plain(self):
        from pygpukit_tpu.llm import apply_chat_template
        out = apply_chat_template(
            [{"role": "system", "content": "s"},
             {"role": "user", "content": "u"}], template="llama2")
        assert "[INST]" in out and "<<SYS>>" in out
        out = apply_chat_template([{"role": "user", "content": "u"}],
                                  template="plain")
        assert out.endswith("assistant:")


class TestStreamingLoader:
    def _make_ckpt(self, tmp_path, n_tensors=6):
        import safetensors.numpy as stnp
        data = {f"layer.{i}.w": np.full((8, 8), i, np.float32)
                for i in range(n_tensors)}
        stnp.save_file(data, str(tmp_path / "model.safetensors"))
        return tmp_path

    def test_lazy_loader_lru(self, tmp_path):
        from pygpukit_tpu.llm import LazyModelLoader
        d = self._make_ckpt(tmp_path)
        loader = LazyModelLoader(str(d / "model.safetensors"),
                                 max_device_bytes=600)   # ~2 tensors
        loader.get("layer.0.w")
        loader.get("layer.1.w")
        loader.get("layer.2.w")                          # evicts layer.0
        assert loader.stats["evictions"] >= 1
        buf = loader.get("layer.1.w")                    # hit
        assert loader.stats["hits"] >= 1
        np.testing.assert_array_equal(np.asarray(buf), 1.0)

    def test_streaming_context_strategies(self, tmp_path):
        from pygpukit_tpu.llm import LoadingStrategy, create_streaming_context
        d = self._make_ckpt(tmp_path)
        layer_names = [[f"layer.{i}.w"] for i in range(4)]
        with create_streaming_context(
                str(d / "model.safetensors"), layer_names,
                strategy=LoadingStrategy.SIMPLE) as ctx:
            seen = [(i, list(t)) for i, t in ctx]
        assert len(seen) == 4
        assert ctx.loader.stats["evictions"] >= 3   # SIMPLE evicts each layer

    def test_sharded_file(self, tmp_path):
        import json
        import safetensors.numpy as stnp
        stnp.save_file({"a": np.ones((2,), np.float32)},
                       str(tmp_path / "model-00001-of-00002.safetensors"))
        stnp.save_file({"b": np.zeros((3,), np.float32)},
                       str(tmp_path / "model-00002-of-00002.safetensors"))
        index = {"weight_map": {"a": "model-00001-of-00002.safetensors",
                                "b": "model-00002-of-00002.safetensors"}}
        (tmp_path / "model.safetensors.index.json").write_text(
            json.dumps(index))
        from pygpukit_tpu.llm import load_safetensors
        st = load_safetensors(tmp_path)
        assert set(st.keys()) == {"a", "b"}
        assert st.tensor_numpy("b").shape == (3,)


class TestRepack:
    def test_pads_to_lane_width(self):
        import jax.numpy as jnp
        from pygpukit_tpu.llm import (
            TransformerConfig, init_params, repack_model_weights,
        )
        cfg = TransformerConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=100,  # not lane-aligned
            head_dim_override=8, max_position_embeddings=32,
            tie_word_embeddings=True)
        params = init_params(cfg, 0, jnp.float32)
        packed, info = repack_model_weights(params)
        assert info["intermediate_pad"] == 28
        assert packed["layers"]["w_gate"].shape[-1] == 128
        assert packed["layers"]["w_down"].shape[-2] == 128


class TestTokenizer:
    def _write_tokenizer_json(self, path):
        import json
        # minimal byte-level BPE: vocab of single mapped bytes + one merge
        from pygpukit_tpu.llm.tokenizer import _bytes_to_unicode
        b2u = _bytes_to_unicode()
        vocab = {}
        for b, u in b2u.items():
            vocab[u] = len(vocab)
        hel = b2u[ord("h")] + b2u[ord("e")]
        vocab[hel] = len(vocab)
        data = {
            "model": {"type": "BPE", "vocab": vocab,
                      "merges": [f"{b2u[ord('h')]} {b2u[ord('e')]}"]},
            "added_tokens": [{"content": "<|end|>", "id": 9999}],
        }
        path.write_text(json.dumps(data))

    def test_own_bpe_roundtrip(self, tmp_path, monkeypatch):
        from pygpukit_tpu.llm.tokenizer import _ByteLevelBPE
        f = tmp_path / "tokenizer.json"
        self._write_tokenizer_json(f)
        bpe = _ByteLevelBPE(str(f))
        ids = bpe.encode("hello")
        assert len(ids) == 4            # "he" merged + l + l + o
        assert bpe.decode(ids) == "hello"

    def test_special_tokens(self, tmp_path):
        from pygpukit_tpu.llm.tokenizer import _ByteLevelBPE
        f = tmp_path / "tokenizer.json"
        self._write_tokenizer_json(f)
        bpe = _ByteLevelBPE(str(f))
        ids = bpe.encode("hi<|end|>ok")
        assert 9999 in ids
        assert bpe.decode(ids) == "hi<|end|>ok"

    def test_hf_wrapper_if_available(self, tmp_path):
        pytest.importorskip("tokenizers")
        from pygpukit_tpu.llm import Tokenizer
        # the HF runtime rejects our minimal json? fall back gracefully —
        # just assert construction picks one of the two paths
        f = tmp_path / "tokenizer.json"
        self._write_tokenizer_json(f)
        tok = Tokenizer(str(f))
        ids = tok.encode("he")
        assert isinstance(ids, list) and ids


class TestGuardTemplate:
    def test_guard_prompt_structure(self):
        from pygpukit_tpu.llm import apply_guard_template
        out = apply_guard_template([
            {"role": "user", "content": "how do I bake bread?"}])
        assert "BEGIN UNSAFE CONTENT CATEGORIES" in out
        assert "User: how do I bake bread?" in out
        assert out.rstrip().endswith("<|end_header_id|>")
        out2 = apply_guard_template(
            [{"role": "user", "content": "x"}], categories=["S1: Test"])
        assert "S1: Test" in out2 and "S2" not in out2


class TestBenchmarkFramework:
    def test_bench_result_derivations(self):
        from pygpukit_tpu.benchmark import BenchResult
        r = BenchResult("x", ms=2.0, flops=4e9, bytes=2e9)
        assert r.tflops == pytest.approx(2.0)
        assert r.gbps == pytest.approx(1000.0)

    def test_report_markdown(self):
        from pygpukit_tpu.benchmark import Benchmark, BenchResult

        class Fake(Benchmark):
            title = "fake"

            def run(self):
                self.results.append(BenchResult("op", 1.0, flops=1e12))

        suite = Fake()
        suite.run()
        md = suite.report_markdown()
        assert "## fake" in md and "| op |" in md and "% peak |" in md

    def test_time_fn_measures(self):
        import jax, jax.numpy as jnp
        from pygpukit_tpu.benchmark import time_fn
        f = jax.jit(lambda x: x * 2)
        ms = time_fn(f, jnp.ones((8,)), iters=3, warmup=1)
        assert ms > 0


class TestProfiler:
    def test_record_and_summary(self):
        import jax, jax.numpy as jnp
        from pygpukit_tpu.profiling import Profiler
        p = Profiler()
        p.enable()
        f = jax.jit(lambda x: x @ x)
        x = jnp.ones((64, 64))
        rec = p.profile_fn("mm64", f, x, flops=2 * 64**3, iters=3, warmup=1)
        assert rec.tflops > 0
        assert "mm64" in p.summary()
        stats = p.stats()
        assert stats["mm64"].count == 3

    def test_disabled_noop(self):
        from pygpukit_tpu.profiling import Profiler
        p = Profiler()
        with p.record("x"):
            pass
        assert not p.records

    def test_memory_profiler(self):
        from pygpukit_tpu.profiling import MemoryProfiler
        mp = MemoryProfiler()
        mp.snapshot("a")
        mp.snapshot("b")
        assert isinstance(mp.delta(), int)
        assert "used GiB" in mp.summary()


class TestArrayReductions:
    def test_methods(self, rng):
        x = rng.standard_normal((4, 6)).astype(np.float32)
        a = gp.from_numpy(x)
        np.testing.assert_allclose(a.sum().to_numpy(), x.sum(), rtol=1e-5)
        np.testing.assert_allclose(a.mean(axis=0).to_numpy(), x.mean(0),
                                   rtol=1e-5)
        np.testing.assert_allclose(a.max().to_numpy(), x.max())
        np.testing.assert_allclose(a.min(axis=1).to_numpy(), x.min(1))
        assert a.argmax(axis=1).to_numpy().tolist() == x.argmax(1).tolist()


class TestExecutableDonation:
    def test_donated_buffer_reuse(self):
        import jax, jax.numpy as jnp
        from pygpukit_tpu.core.executable import capture
        # donated arg 0 is consumed; the returned buffer carries the update
        exe = capture(lambda c, x: (c + x, jnp.sum(c)), jnp.zeros((8,)),
                      jnp.ones((8,)), donate_argnums=(0,))
        c = jnp.zeros((8,))
        for i in range(3):
            c, s = exe.replay(c, jnp.ones((8,)))
        np.testing.assert_allclose(np.asarray(c), 3.0)
        assert exe.stats.replays == 3


class TestSafeTensorsWriter:
    """save_safetensors / save_model_params round-trips (checkpoint/resume
    of native — incl. quantized — weights; SURVEY §5.4)."""

    def test_roundtrip_dtypes(self, tmp_path):
        import jax.numpy as jnp
        import ml_dtypes
        from pygpukit_tpu.llm import save_safetensors
        from pygpukit_tpu.llm.safetensors import SafeTensorsFile
        rng = np.random.default_rng(0)
        data = {
            "a": rng.standard_normal((4, 8)).astype(np.float32),
            "b": rng.standard_normal((3,)).astype(ml_dtypes.bfloat16),
            "c": rng.integers(0, 255, (5, 2)).astype(np.uint8),
        }
        path = tmp_path / "w.safetensors"
        save_safetensors(path, data)
        st = SafeTensorsFile(path)
        for k, v in data.items():
            got = np.asarray(st.tensor_numpy(k))
            np.testing.assert_array_equal(got, v)
        # cross-check against the reference implementation's reader
        import safetensors.numpy as stnp
        ref = stnp.load_file(str(path))
        np.testing.assert_array_equal(ref["a"], data["a"])
        st.close()

    def test_quantized_model_checkpoint_resume(self, tmp_path):
        import jax.numpy as jnp
        from pygpukit_tpu.llm import (
            CausalTransformerModel, TransformerConfig, init_params,
            load_model_params, quantize_model_params, save_model_params,
        )
        cfg = TransformerConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=64, head_dim_override=8,
            max_position_embeddings=64, tie_word_embeddings=True)
        qp = quantize_model_params(init_params(cfg, 5, jnp.float32), "int8")
        model = CausalTransformerModel(cfg, qp, dtype=jnp.float32)
        ref = model.generate([1, 2, 3], max_new_tokens=5, temperature=0.0)

        path = tmp_path / "ckpt.safetensors"
        save_model_params(path, qp)
        restored = load_model_params(path)
        assert "q" in restored["layers"]["w_q"]          # quantized leaf kept
        m2 = CausalTransformerModel(cfg, restored, dtype=jnp.float32)
        assert m2.generate([1, 2, 3], max_new_tokens=5,
                           temperature=0.0) == ref
