from mex_extractors_ray.settings import EngineSettings


def test_defaults():
    s = EngineSettings()
    assert s.ingest.num_partitions == 64
    assert s.ingest.mode == "last_wins"
    assert s.checks.blocking is True


def test_env_overrides():
    s = EngineSettings.from_env(
        {
            "MEX_RAY_INGEST_NUM_PARTITIONS": "128",
            "MEX_RAY_INGEST_MODE": "first_wins",
            "MEX_RAY_CHECKS_BLOCKING": "false",
            "MEX_RAY_CHECKS_RULES": '[{"type": "x_items_less_than", "value": 5}]',
            "MEX_RAY_BENCH_NUM_CPUS": "8",
            "MEX_RAY_WORK_ROOT": "/tmp/elsewhere",
        }
    )
    assert s.ingest.num_partitions == 128
    assert s.ingest.mode == "first_wins"
    assert s.checks.blocking is False
    assert s.checks.rules[0]["type"] == "x_items_less_than"
    assert s.bench.num_cpus == 8
    assert s.work_root == "/tmp/elsewhere"
