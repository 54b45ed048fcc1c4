"""TPU-native HMM spike sorter (Herbst et al. 2008 signal chain).

Public surface:
    from hmmspikesorter_tpu import api        # fit / decode / predict / bic
    from hmmspikesorter_tpu import posterior  # onset marginals, per-spike
                                              # confidence (beyond reference)
    from hmmspikesorter_tpu import extraction # spike times, MAT unit export
    python -m hmmspikesorter_tpu.cli          # batch sorting CLI
"""

from .models import api  # noqa: F401
from .models import multichannel  # noqa: F401
from .core import posterior  # noqa: F401
from .core import qc  # noqa: F401  (per-unit quality metrics)
from .io import extraction  # noqa: F401
from .train import adaptive  # noqa: F401  (drift tracking, beyond reference)
from .config import (Config, DecodeConfig, MeshConfig, ModelConfig,  # noqa: F401
                     TrainConfig)

__version__ = "0.1.0"
