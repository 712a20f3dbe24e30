import numpy as np

from llama_cu_awq_tpu.io import checkpoint as ck
from llama_cu_awq_tpu.quant import packing


def test_checkpoint_roundtrip(tmp_path, tiny_config):
    ckpt = ck.random_checkpoint(tiny_config, seed=7)
    path = tmp_path / "model.bin"
    ck.save_checkpoint(str(path), ckpt)
    back = ck.load_checkpoint(str(path))

    assert back.config == tiny_config
    assert np.array_equal(back.embed, ckpt.embed)
    assert np.array_equal(back.lm_head, ckpt.lm_head)
    assert np.array_equal(back.final_norm, ckpt.final_norm)
    assert len(back.layers) == tiny_config.n_layers
    for la, lb in zip(ckpt.layers, back.layers):
        for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
            qa, qb = getattr(la, name), getattr(lb, name)
            assert np.array_equal(qa.qw, qb.qw), name
            assert np.array_equal(qa.zeros, qb.zeros), name
            assert np.array_equal(qa.scales, qb.scales), name
            assert (qa.n_in, qa.n_out) == (qb.n_in, qb.n_out)
        assert np.array_equal(la.attn_norm, lb.attn_norm)
        assert np.array_equal(la.ffn_norm, lb.ffn_norm)


def test_checkpoint_file_size(tmp_path, tiny_config):
    """Byte size must match what the reference loader freads
    (llama2_q4.cu:157-202): header + fp16 blobs + padded quant sections."""
    cfg = tiny_config
    ckpt = ck.random_checkpoint(cfg, seed=0)
    path = tmp_path / "model.bin"
    ck.save_checkpoint(str(path), ckpt)

    def qbytes(n, d):
        g = packing.div_up(n, 128)
        return (packing.packed_weight_height(n) * d * 4
                + packing.div_up(g, 8) * d * 4 + g * d * 2)

    dim, kv, hid = cfg.dim, cfg.kv_dim, cfg.hidden_dim
    per_layer = (qbytes(dim, dim) * 2 + qbytes(dim, kv) * 2
                 + qbytes(dim, hid) * 2 + qbytes(hid, dim) + dim * 2 * 2)
    expect = (32 + cfg.vocab_size * dim * 2 * 2 + dim * 2
              + cfg.n_layers * per_layer)
    assert path.stat().st_size == expect


def test_random_checkpoint_dequant_error_small(tiny_config):
    ckpt = ck.random_checkpoint(tiny_config, seed=3)
    q = ckpt.layers[0].wq
    w = packing.dequantize_np(q.qw, q.zeros, q.scales, q.n_in)
    assert w.shape == (q.n_in, q.n_out)
    assert np.isfinite(w).all()
