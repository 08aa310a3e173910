from mvlt_tpu.text.tokenizer import WordPieceTokenizer, load_vocab, find_default_vocab

__all__ = ["WordPieceTokenizer", "load_vocab", "find_default_vocab"]
