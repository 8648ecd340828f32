from qgemm_tpu.utils.prng import key_seq, uniform_init  # noqa: F401
from qgemm_tpu.utils.testing import allclose, assert_allclose  # noqa: F401
