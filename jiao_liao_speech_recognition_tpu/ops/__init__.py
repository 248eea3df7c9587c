"""On-device ops: CTC loss (log-semiring scan), Pallas flash attention,
and supporting kernels.

TPU-native replacements for the reference's cuDNN CTC loss
(torch.nn.functional.ctc_loss, /root/reference/requirements.txt:75; SURVEY
N1) and CUDA attention kernels.
"""

from .ctc_loss import ctc_loss  # noqa: F401
