from mvlt_tpu.metrics.bleu import corpus_bleu
from mvlt_tpu.metrics.cider import corpus_cider
from mvlt_tpu.metrics.eval_cap import CaptionEvaluator, compute_scores
from mvlt_tpu.metrics.meteor import corpus_meteor
from mvlt_tpu.metrics.ptb import ptb_tokenize, ptb_tokenize_corpus
from mvlt_tpu.metrics.retrieval import compute_ranks, recall_at_k
from mvlt_tpu.metrics.rouge import corpus_rouge_l
from mvlt_tpu.metrics.vqa import vqa_accuracy

__all__ = ["corpus_bleu", "corpus_cider", "corpus_rouge_l", "corpus_meteor",
           "ptb_tokenize", "ptb_tokenize_corpus", "CaptionEvaluator",
           "compute_scores", "compute_ranks", "recall_at_k", "vqa_accuracy"]
