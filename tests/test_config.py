from mvlt_tpu.config import (FusionConfig, MVLTConfig, swin_base, swin_small)


def test_task_variants_match_reference_defaults():
    # reference modules/config.py:29-72
    vqa = MVLTConfig.for_vqa()
    assert vqa.fusion.hidden_dropout_prob == 0.1
    assert vqa.result_num == 224 and vqa.lr == 4e-5

    pre = MVLTConfig.for_pretrain()
    assert pre.max_length == 150 and not pre.itm_task

    ret = MVLTConfig.for_retrieval()
    assert ret.max_length == 80 and ret.lr == 1e-6
    assert ret.fusion.attention_probs_dropout_prob == 0.1
    assert ret.fusion.hidden_dropout_prob == 0.0

    cap = MVLTConfig.for_caption()
    assert cap.is_decoder and cap.max_length == 80 and cap.lr == 1e-5

    # Optimizer parity by default: every reference-recipe preset stores
    # AdamW's first moment in float32 (bf16 mu is an opt-in perf knob).
    for cfg in (vqa, pre, ret, cap):
        assert cfg.adam_mu_dtype == "float32"


def test_swin_variants():
    s = swin_small()
    assert s.embed_dim == 96 and s.depths == (2, 2, 18, 2)
    assert s.num_features == 768 and s.patches_resolution == (56, 56)
    b = swin_base()
    assert b.embed_dim == 128 and b.num_heads == (4, 8, 16, 32)
    assert b.num_features == 1024


def test_embedding_rows_quirk():
    # model.py:21 — Embedding(vocab_size + 1, hidden)
    assert FusionConfig().embedding_rows == 30523


def test_json_roundtrip():
    cfg = MVLTConfig.for_caption(conv="swin")
    other = MVLTConfig.from_json(cfg.to_json())
    assert other == cfg


def test_with_tokenizer():
    from mvlt_tpu.text import WordPieceTokenizer, find_default_vocab
    vocab = find_default_vocab()
    if vocab is None:
        return
    tok = WordPieceTokenizer(vocab)
    cfg = MVLTConfig.for_vqa().with_tokenizer(tok)
    assert cfg.eos_token_id == tok.eos_token_id
    assert cfg.cls_token_id == 101 and cfg.sep_token_id == 102
    assert cfg.fusion.vocab_size == len(tok)
