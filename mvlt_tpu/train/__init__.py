from mvlt_tpu.train.state import TrainState, create_train_state, make_optimizer
from mvlt_tpu.train.steps import (make_caption_step, make_pretrain_step,
                                  make_retrieval_step, make_train_step,
                                  make_vqa_step, seq2seq_coin_flip,
                                  shard_train_state)

__all__ = ["TrainState", "create_train_state", "make_optimizer",
           "make_train_step", "make_vqa_step", "make_pretrain_step",
           "make_retrieval_step", "make_caption_step", "shard_train_state",
           "seq2seq_coin_flip"]
