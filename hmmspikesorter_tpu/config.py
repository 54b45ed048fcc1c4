"""Unified configuration (SURVEY.md §5.6): one dataclass tree covering
model topology, EM training, decode protocol, and device-mesh layout.

The reference scatters every option across positional/keyword defaults
(src/baumwelch.jl:311, src/fit.jl:11, src/hmmsort.jl:6-34); this module
gives them one typed home while every public entry point keeps its plain
kwargs as sugar (None fields mean "unset" and fall through to the entry
point's own default — e.g. nsteps resolves to 8 in train_model and 10 in
fit_template_model):

    cfg = Config(model=ModelConfig(n_neurons=2, K=60),
                 train=TrainConfig(nsteps=12),
                 decode=DecodeConfig(engine="fast", L=16384))
    tm = api.fit_template_model(y, config=cfg)
    m = api.fit_spiking_model_fast(tm, y, config=cfg)

Resolution rule everywhere: an explicitly passed kwarg wins over the
config, which wins over the built-in (reference) default. Field defaults
mirror the reference's: N=3, K=60, p0=2^(-3K/2) (derived when None),
condense alpha=0.05, sparse cutoff -70, chunksize=100_000,
max_templates=4.
"""

from __future__ import annotations

import dataclasses


class _Unset:
    """Sentinel distinguishing 'kwarg not passed' from a passed None."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "UNSET"

    def __bool__(self):
        return False


UNSET = _Unset()


def pick(explicit, cfg_value, default):
    """explicit kwarg > config field > built-in default."""
    if explicit is not UNSET:
        return explicit
    if cfg_value is not UNSET and cfg_value is not None:
        return cfg_value
    return default


@dataclasses.dataclass
class ModelConfig:
    """State-space topology (reference src/baumwelch.jl:311, types.jl:65)."""

    n_neurons: int = 3
    K: int = 60
    allow_overlaps: bool = False     # decode-time; training is non-overlap


@dataclasses.dataclass
class TrainConfig:
    """EM training schedule and surgery thresholds (baumwelch.jl:311-354)."""

    nsteps: int | None = None        # None -> entry-point default (8 for
    #                                  train_model, baumwelch.jl:311; 10
    #                                  for fit_template_model)
    p0: float | None = None          # None -> 2^(-3K/2) (baumwelch.jl:311)
    condense_alpha: float = 0.05     # merge chi^2 level (baumwelch.jl:340)
    sparse_lp0: float = -70.0        # onset-logp cutoff (baumwelch.jl:344)
    small_alpha: float = 0.05        # energy-test level (baumwelch.jl:347)
    fb_mode: str | None = None       # None -> ring on CPU, blocked on TPU


@dataclasses.dataclass
class DecodeConfig:
    """Decode protocol: reference-sequential or parallel overlap-save."""

    engine: str = "reference"        # "reference" | "fast"
    chunksize: int = 100_000         # reference src/hmmsort.jl:90
    L: int = 8192                    # overlap-save core block
    H: int | None = None             # halo; None -> max(4K, 64)
    streaming: bool | None = None    # None = auto (recordings past
    #                                  MAX_ONESHOT_BLOCKS stream); True /
    #                                  False force the block-batch driver
    #                                  or the one-shot program
    blocks_per_call: int = 256
    prefetch: int = 2                # streaming double-buffer depth
    repair: bool = True              # widen-and-re-decode flagged seams
    block_engine: str = "auto"   # "ring" | "pallas" | "pallas_ovn" | "auto"
    transfer: str = "dense"          # "dense" | "events" (sparse onset
    #                                  grid + exact host reconstruction —
    #                                  core/events.py; wins when the
    #                                  host<->device label transfer
    #                                  dominates, e.g. tunneled backends)
    channels: object = 1             # 1 (reference contract) | "all"
    multichannel: bool = False       # joint multi-channel decode (all
    #                                  spikeForms channels; beyond reference)
    max_templates: int = 4           # CLI bail threshold (hmmsort.jl:50)
    confidence: bool = False         # add per-spike posterior confidence
    #                                  to the CLI output (core/posterior)
    qc: bool = False                 # per-unit quality-control struct in
    #                                  the CLI output (core/qc.py)
    adaptive: bool = False           # drift-adaptive decode: online-EM
    #                                  template tracking + per-chunk
    #                                  decode (train/adaptive.py)
    adapt_chunk: int = 32768         # tracking chunk / decode window
    forget: float = 0.3              # online-EM forgetting factor (0, 1]


@dataclasses.dataclass
class MeshConfig:
    """Device-mesh layout for the sharded paths (SURVEY.md §5.8)."""

    time_shards: int | None = None     # None -> infer from devices
    channel_shards: int | None = None
    axes: tuple = ("channel", "time")


@dataclasses.dataclass
class Config:
    """The full framework configuration (SURVEY.md §5.6)."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    decode: DecodeConfig = dataclasses.field(default_factory=DecodeConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)


def _section(config: Config | None, name: str):
    """Returns an attribute-getter over one section that yields UNSET when
    no config was provided (so `pick` falls through to the default)."""
    sec = getattr(config, name, None) if config is not None else None

    def get(field):
        return getattr(sec, field) if sec is not None else UNSET

    return get
