from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request  # noqa: F401
from qgemm_tpu.serving.seq2seq import Seq2SeqEngine  # noqa: F401
from qgemm_tpu.serving.speculative import speculative_generate  # noqa: F401
