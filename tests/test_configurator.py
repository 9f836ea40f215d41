"""Configurator strategy-switch tests (reference configurator.py parity).

Each test pins one documented resolution rule; file:line cites are to
/root/reference/parquet-compactor/configurator.py.
"""

from __future__ import annotations

import json

import pytest

from parquet_compactor_spark.config import resolve
from parquet_compactor_spark.configurator import (
    EnvConfigurator,
    ProviderConfigurator,
    get_configurator,
)

DOC = {
    "objectStore": {
        "hostname": "minio.example.internal",
        "port": 9000,
        "tls": False,
        "accessKey": "store-ak",
        "secretKey": "store-sk",
        "buckets": [
            {
                "name": "real-a",
                "requestedName": "want-a",
                "accessKey": "ak-a",
                "secretKey": "sk-a",
            },
            {
                "name": "real-b",
                "requestedName": "want-b",
                "accessKey": "ak-b",
                "secretKey": "sk-b",
            },
        ],
    }
}


# --- strategy switch (configurator.py:8-16) ---------------------------------


def test_switch_defaults_to_env():
    assert isinstance(get_configurator(env={}), EnvConfigurator)


@pytest.mark.parametrize("flag", ["true", "True", "1", "yes", "on"])
def test_switch_truthy_selects_provider(flag):
    c = get_configurator(env={"PROVIDER_CONFIG_ENABLED": flag}, doc=DOC)
    assert isinstance(c, ProviderConfigurator)


def test_switch_falsy_selects_env():
    c = get_configurator(env={"PROVIDER_CONFIG_ENABLED": "false"})
    assert isinstance(c, EnvConfigurator)


def test_provider_enabled_without_path_or_doc_raises():
    with pytest.raises(ValueError):
        get_configurator(env={"PROVIDER_CONFIG_ENABLED": "true"})


def test_provider_doc_loaded_from_path(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(DOC))
    c = get_configurator(
        env={"PROVIDER_CONFIG_ENABLED": "true", "PROVIDER_CONFIG_PATH": str(p)}
    )
    assert c.get_object_store_bucket("want-b") == "real-b"


# --- env path (configurator.py:19-70) ---------------------------------------


def test_env_endpoint_default_and_https_prepend():
    assert (
        EnvConfigurator(env={}).get_object_store_endpoint()
        == "https://s3.us-east-1.amazonaws.com"
    )
    assert (
        EnvConfigurator(env={"S3_ENDPOINT": "minio:9000"}).get_object_store_endpoint()
        == "https://minio:9000"
    )
    assert (
        EnvConfigurator(
            env={"S3_ENDPOINT": "http://minio:9000"}
        ).get_object_store_endpoint()
        == "http://minio:9000"
    )


def test_env_bucket_defaults_to_requested_name():
    assert EnvConfigurator(env={}).get_object_store_bucket("fallback") == "fallback"
    assert (
        EnvConfigurator(env={"REQUESTED_BUCKET": "b"}).get_object_store_bucket("x")
        == "b"
    )


def test_env_data_prefix_default():
    assert EnvConfigurator(env={}).get_data_prefix() == "data/parquet/"


# --- provider path (configurator.py:73-139) ---------------------------------


def test_provider_endpoint_scheme_port():
    c = ProviderConfigurator(env={}, doc=DOC)
    assert c.get_object_store_endpoint() == "http://minio.example.internal:9000"
    tls_doc = json.loads(json.dumps(DOC))
    tls_doc["objectStore"]["tls"] = True
    tls_doc["objectStore"]["port"] = None
    c = ProviderConfigurator(env={}, doc=tls_doc)
    assert c.get_object_store_endpoint() == "https://minio.example.internal"


@pytest.mark.parametrize(
    "tls,expected",
    [(True, True), (False, False), ("TRUE", True), ("false", False), ("junk", False), (None, False)],
)
def test_provider_tls_coercion(tls, expected):
    doc = json.loads(json.dumps(DOC))
    doc["objectStore"]["tls"] = tls
    assert ProviderConfigurator(env={}, doc=doc).get_object_store_tls() is expected


def test_provider_key_resolution_order():
    c = ProviderConfigurator(env={}, doc=DOC)
    # named match first (configurator.py:111-112)
    assert c.get_object_store_access_key("want-b") == "ak-b"
    assert c.get_object_store_secret_key("want-b") == "sk-b"
    # no name → first bucket (configurator.py:113-114)
    assert c.get_object_store_access_key() == "ak-a"
    # no buckets → store-level key (configurator.py:115-116)
    doc = json.loads(json.dumps(DOC))
    doc["objectStore"]["buckets"] = []
    c = ProviderConfigurator(env={}, doc=doc)
    assert c.get_object_store_access_key() == "store-ak"
    assert c.get_object_store_secret_key() == "store-sk"


def test_provider_bucket_name_mapping():
    c = ProviderConfigurator(env={}, doc=DOC)
    assert c.get_object_store_bucket("want-a") == "real-a"
    # unknown requested name passes through (configurator.py:132-134)
    assert c.get_object_store_bucket("nope") == "nope"


# --- resolve(): switch wired into EngineSettings ----------------------------


def test_resolve_provider_path_fills_settings():
    s = resolve(
        env={"PROVIDER_CONFIG_ENABLED": "true", "TARGET_FILE_SIZE_GB": "0.5"},
        provider_doc=DOC,
        requested_bucket="want-a",
    )
    assert s.bucket == "real-a"
    assert s.endpoint == "http://minio.example.internal:9000"
    assert s.access_key == "ak-a"
    assert s.compaction.target_file_size_gb == 0.5


def test_resolve_env_path_fills_settings():
    s = resolve(
        env={"REQUESTED_BUCKET": "plain", "AWS_ACCESS_KEY_ID": "ak"},
        requested_bucket="",
    )
    assert s.bucket == "plain"
    assert s.endpoint == "https://s3.us-east-1.amazonaws.com"
    assert s.access_key == "ak"
