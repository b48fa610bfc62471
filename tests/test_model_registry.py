"""Model-registry lifecycle parity with the reference's MLflow flow:
register → latest → ready-wait → transition(Staging) → scoring lookup.
"""

from __future__ import annotations

import pytest

from time_series_prediction_spark.model.registry import (
    LocalModelRegistry,
    wait_until_model_ready,
)


@pytest.fixture()
def reg(tmp_path):
    return LocalModelRegistry(str(tmp_path / "registry"))


def test_training_to_scoring_lifecycle(reg):
    # T.3 tail: register after training, grab latest, wait, stage it
    v1 = reg.register("cashflow", run_id="run-a", source="/tmp/m1")
    assert (v1.version, v1.current_stage, v1.status) == (1, "None", "READY")
    latest = reg.latest_version("cashflow")
    assert latest.version == 1
    wait_until_model_ready(reg, "cashflow", 1)
    reg.transition("cashflow", 1, "Staging")

    # S.2: scoring-side lookup by stage
    staged = reg.latest_version("cashflow", stage="Staging")
    assert (staged.version, staged.run_id) == (1, "run-a")

    # second training run supersedes in Staging; v1 auto-archives
    v2 = reg.register("cashflow", run_id="run-b", source="/tmp/m2")
    assert v2.version == 2
    reg.transition("cashflow", 2, "Staging")
    assert reg.latest_version("cashflow", stage="Staging").version == 2
    assert reg.get_model_version("cashflow", 1).current_stage == "Archived"

    # promote to Production (prod scoring looks here)
    reg.transition("cashflow", 2, "Production")
    assert reg.latest_version("cashflow", stage="Production").version == 2
    with pytest.raises(LookupError):
        reg.latest_version("cashflow", stage="Staging")


def test_invalid_operations(reg):
    with pytest.raises(KeyError):
        reg.get_model_version("nope", 1)
    reg.register("m", run_id="r", source="s")
    with pytest.raises(ValueError):
        reg.transition("m", 1, "production")  # stages are case-sensitive
    with pytest.raises(KeyError):
        reg.transition("m", 9, "Staging")


def test_registry_survives_reopen(tmp_path):
    root = str(tmp_path / "registry")
    LocalModelRegistry(root).register("m", run_id="r1", source="s1")
    reopened = LocalModelRegistry(root)
    v2 = reopened.register("m", run_id="r2", source="s2")
    assert v2.version == 2
    assert len(reopened.search_model_versions("m")) == 2
