"""Model-registry lifecycle: the reference's MLflow usage re-expressed
as an honest local substitute.

The reference registers each trained model, finds the latest version,
waits for READY, transitions None → Staging (→ Production in prod),
and at scoring time looks up the version currently in a given stage
(reference ``notebooks/training_new_petastorm.py:329-370``,
``notebooks/scoring.py:282-290``). That is REST plumbing around four
operations — register / get-latest / transition / lookup-by-stage —
which this module implements against a local JSON-file store with the
same semantics:

* versions are integers starting at 1, monotonically increasing;
* stages are ``None`` / ``Staging`` / ``Production`` / ``Archived``;
* transitioning a version into Staging or Production can archive the
  incumbent (``archive_existing``), mirroring MLflow's
  ``transition_model_version_stage``;
* ``latest_version(stage)`` returns the HIGHEST version currently in
  that stage — the scoring-side lookup.

When the real ``mlflow`` package is importable, callers can use it
directly; this store keeps the pipeline runnable (and its lifecycle
testable) in environments without an MLflow server. Writes go through
an atomic rename so concurrent readers never see a torn file.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass

STAGES = ("None", "Staging", "Production", "Archived")


@dataclass
class ModelVersion:
    name: str
    version: int
    run_id: str
    current_stage: str
    status: str  # PENDING_REGISTRATION | READY
    source: str  # artifact path
    creation_timestamp: float


class LocalModelRegistry:
    """File-backed registry: one JSON file per model name under
    ``root``. Driver-side only — model metadata is tiny and the store
    is never touched by executors."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.json")

    def _load(self, name: str) -> list[dict]:
        try:
            with open(self._path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def _save(self, name: str, versions: list[dict]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(versions, f, indent=1)
        os.replace(tmp, self._path(name))

    def register(self, name: str, run_id: str, source: str) -> ModelVersion:
        """≈ mlflow log_model(registered_model_name=...): next version,
        stage None, immediately READY (no async backend here — the
        reference's wait_until_model_ready loop is satisfied at once)."""
        versions = self._load(name)
        v = ModelVersion(
            name=name,
            version=max((d["version"] for d in versions), default=0) + 1,
            run_id=run_id,
            current_stage="None",
            status="READY",
            source=source,
            creation_timestamp=time.time(),
        )
        versions.append(asdict(v))
        self._save(name, versions)
        return v

    def search_model_versions(self, name: str) -> list[ModelVersion]:
        return [ModelVersion(**d) for d in self._load(name)]

    def get_model_version(self, name: str, version: int) -> ModelVersion:
        for d in self._load(name):
            if d["version"] == version:
                return ModelVersion(**d)
        raise KeyError(f"{name} v{version} not registered")

    def latest_version(self, name: str, stage: str | None = None) -> ModelVersion:
        """Highest version, optionally restricted to a stage — the
        scoring-side lookup (reference scans search_model_versions for
        current_stage == Staging/Production)."""
        cands = [
            d
            for d in self._load(name)
            if stage is None or d["current_stage"] == stage
        ]
        if not cands:
            raise LookupError(f"no {name} version in stage {stage!r}")
        return ModelVersion(**max(cands, key=lambda d: d["version"]))

    def transition(
        self,
        name: str,
        version: int,
        stage: str,
        archive_existing: bool = True,
    ) -> ModelVersion:
        """≈ client.transition_model_version_stage. Staging/Production
        demote the incumbent to Archived when archive_existing."""
        if stage not in STAGES:
            raise ValueError(f"stage must be one of {STAGES}, got {stage!r}")
        versions = self._load(name)
        target = None
        for d in versions:
            if d["version"] == version:
                target = d
        if target is None:
            raise KeyError(f"{name} v{version} not registered")
        if archive_existing and stage in ("Staging", "Production"):
            for d in versions:
                if d["current_stage"] == stage and d["version"] != version:
                    d["current_stage"] = "Archived"
        target["current_stage"] = stage
        self._save(name, versions)
        return ModelVersion(**target)


def wait_until_model_ready(
    registry: LocalModelRegistry,
    name: str,
    version: int,
    attempts: int = 20,
    sleep_s: float = 0.0,
) -> ModelVersion:
    """Reference's readiness poll (training_new_petastorm.py:350-363);
    the local store is synchronously READY so this returns on the
    first probe, but the loop shape matches the async-backend case."""
    for _ in range(attempts):
        mv = registry.get_model_version(name, version)
        if mv.status == "READY":
            return mv
        time.sleep(sleep_s)
    raise TimeoutError(f"{name} v{version} never became READY")
