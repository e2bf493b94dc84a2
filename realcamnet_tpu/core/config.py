"""Experiment configuration: dataclasses + JSON round-trip.

The reference has no config system — model selection is done by editing
commented-out lines (`LiteISP.py:2662-2669`) and an implied `opt` namespace
feeds `get_scheduler` (`networks.py:50-71`, SURVEY.md §5.6). Here a single
dataclass tree covers model choice, training hyperparameters, data, and the
RD sweep; the CLI and library both consume it.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Sequence, Tuple


@dataclasses.dataclass
class ModelConfig:
    name: str = "raw_compression_tcm_final"
    kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class TrainConfig:
    steps: int = 1_000_000
    batch_size: int = 8
    patch: int = 128
    lr: float = 1e-4
    aux_lr: float = 1e-3
    lr_policy: str = "constant"  # linear | step | cosine | constant
    niter: int = 500_000
    niter_decay: int = 500_000
    lr_decay_iters: int = 100_000
    clip_norm: float = 1.0
    lmbda: float = 0.01
    seed: int = 0
    log_every: int = 100
    ckpt_every: int = 5000
    ckpt_dir: str = "ckpt"


@dataclasses.dataclass
class DataConfig:
    source: str = "synthetic"  # 'synthetic' or a directory of .npz pairs
    num_eval_images: int = 16


@dataclasses.dataclass
class MeshConfig:
    data: Optional[int] = None  # None = all devices
    spatial: int = 1


@dataclasses.dataclass
class ExperimentConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    # The paper's four RD operating points (BASELINE.md lambda sweep).
    lambdas: Tuple[float, ...] = (0.0025, 0.0067, 0.013, 0.05)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "ExperimentConfig":
        raw = json.loads(text)
        return cls(
            model=ModelConfig(**raw.get("model", {})),
            train=TrainConfig(**raw.get("train", {})),
            data=DataConfig(**raw.get("data", {})),
            mesh=MeshConfig(**raw.get("mesh", {})),
            lambdas=tuple(raw.get("lambdas", (0.0025, 0.0067, 0.013, 0.05))),
        )

    @classmethod
    def load(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            return cls.from_json(f.read())

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(self.to_json())
