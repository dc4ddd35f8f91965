"""GGUF container round-trip tests (writer -> reader)."""

import numpy as np

from tpu_engine.gguf import GGMLType, GGUFValueType, GGUFWriter, read_gguf

RNG = np.random.default_rng(1)


def test_roundtrip_metadata_and_tensors(tmp_path):
    p = str(tmp_path / "t.gguf")
    w = GGUFWriter(p)
    w.add("general.architecture", "llama")
    w.add("general.name", "unit test model")
    w.add("llama.block_count", 2)
    w.add("llama.embedding_length", 64)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("tokenizer.ggml.add_bos_token", True)
    w.add("some.negative", -5)
    w.add_array("tokenizer.ggml.tokens", ["<s>", "</s>", "hello", "▁world"],
                GGUFValueType.STRING)
    w.add_array("tokenizer.ggml.scores", [0.0, -1.0, -2.5, 3.5], GGUFValueType.FLOAT32)
    w.add_array("tokenizer.ggml.token_type", [3, 3, 1, 1], GGUFValueType.INT32)

    f32 = RNG.normal(size=(64, 64)).astype(np.float32)
    f16 = RNG.normal(size=(4, 256)).astype(np.float16)
    w.add_tensor("tensor.f32", f32)
    w.add_tensor("tensor.f16", f16.astype(np.float32), GGMLType.F16)
    q = RNG.normal(size=(8, 256)).astype(np.float32)
    w.add_tensor("tensor.q4k", q, GGMLType.Q4_K)
    w.write()

    with read_gguf(p) as g:
        assert g.metadata["general.architecture"] == "llama"
        assert g.metadata["llama.block_count"] == 2
        assert abs(g.metadata["llama.rope.freq_base"] - 10000.0) < 1e-6
        assert g.metadata["tokenizer.ggml.add_bos_token"] is True
        assert g.metadata["some.negative"] == -5
        assert list(g.metadata["tokenizer.ggml.tokens"]) == ["<s>", "</s>", "hello", "▁world"]
        np.testing.assert_allclose(
            np.asarray(g.metadata["tokenizer.ggml.scores"]), [0.0, -1.0, -2.5, 3.5]
        )

        np.testing.assert_array_equal(g.tensor_array("tensor.f32"), f32)
        np.testing.assert_array_equal(g.tensor_array("tensor.f16"), f16)
        assert g.tensors["tensor.q4k"].ggml_type == GGMLType.Q4_K
        assert g.tensors["tensor.q4k"].shape == (8, 256)
        deq = g.dequantize("tensor.q4k")
        assert deq.shape == (8, 256)
        rms = np.sqrt(np.mean((deq - q) ** 2))
        assert rms < 0.08

        # data section alignment
        assert g.data_offset % g.alignment == 0
        for ti in g.tensors.values():
            assert ti.offset % g.alignment == 0


def test_dims_order(tmp_path):
    """GGUF stores dims fastest-first; reader flips to numpy convention."""
    p = str(tmp_path / "d.gguf")
    w = GGUFWriter(p)
    w.add("general.architecture", "llama")
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    w.add_tensor("t", arr)
    w.write()
    with read_gguf(p) as g:
        assert g.tensors["t"].shape == (2, 3)
        np.testing.assert_array_equal(g.tensor_array("t"), arr)
