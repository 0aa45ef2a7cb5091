"""Metrics logger, config round-trip, labels."""

import json

from aas_enhancement_tpu.config import Config, preset
from aas_enhancement_tpu.labels import BLANK_ID, LABELS, decode_ids, encode
from aas_enhancement_tpu.utils.metrics import MetricsLogger


def test_metrics_jsonl(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = MetricsLogger(p, echo=False)
    log.log(1, loss=0.5, name="x")
    log.log(2, loss=0.25)
    log.close()
    recs = [json.loads(l) for l in open(p)]
    assert recs[0]["step"] == 1 and recs[0]["loss"] == 0.5 and recs[0]["name"] == "x"
    assert recs[1]["loss"] == 0.25


def test_config_json_roundtrip():
    cfg = Config()
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_presets():
    for name, objective in [("paired", "paired"), ("adversarial", "adversarial"),
                            ("acoustic", "acoustic"), ("aas", "aas")]:
        assert preset(name).train.objective == objective
    assert preset("single_utterance").train.batch_size == 1


def test_labels_roundtrip():
    assert BLANK_ID == 0 and LABELS[0] == "_"
    ids = encode("Hello World!")        # case-folded, '!' dropped
    assert decode_ids(ids) == "HELLO WORLD"