"""Input pipelines — idx-format (MNIST) datasets with a native C++ fast path.

TPU-native analogue of the reference's C++ MNIST loader
(src/utils/dataset_mnist.hh). The numpy parser in :mod:`.mnist` is the
portable implementation; :mod:`.native` exposes the mmap + multithreaded C++
loader (csrc/idx_loader.cpp) via ctypes when built.
"""

from qgemm_tpu.data.mnist import MNIST  # noqa: F401
