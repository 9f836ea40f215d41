"""Object-store config strategy switch (reference configurator parity).

The reference resolves object-store settings through one of two
strategies chosen by an env flag (configurator.py:8-16): a plain-env
configurator (configurator.py:19-70) or a platform-provider one that
reads a mounted config document (configurator.py:73-139). The provider
there is platform-specific; here the same dispatch, method surface and
resolution order are reproduced against a GENERIC JSON document so the
behavior is testable from public knowledge alone:

- switch: ``PROVIDER_CONFIG_ENABLED`` truthy → ``ProviderConfigurator``
  reading ``PROVIDER_CONFIG_PATH`` (a JSON file), else
  ``EnvConfigurator`` (reference configurator.py:12-16, where the flag
  is the platform's enable var).
- endpoint, env path: ``S3_ENDPOINT`` with the reference's default and
  https:// prepend (configurator.py:23-33).
- endpoint, provider path: scheme from tls + host[:port]
  (configurator.py:76-87).
- tls coercion: bool passes through; "true"/"false" (any case) parse;
  anything else is False (configurator.py:99-107).
- access/secret key, provider path: named-bucket match first, then the
  first bucket's key, then the store-level key
  (configurator.py:109-127).
- bucket, provider path: named-bucket match else the requested name
  (configurator.py:129-134); env path: ``REQUESTED_BUCKET`` defaulting
  to the requested name (configurator.py:63-66).
- data prefix: ``S3_DATA_PREFIX`` default ``data/parquet/`` on BOTH
  paths (configurator.py:68-70, 136-139).

The provider document shape::

    {"objectStore": {"hostname": ..., "port": ..., "tls": ...,
                     "accessKey": ..., "secretKey": ...,
                     "buckets": [{"name": ..., "requestedName": ...,
                                  "accessKey": ..., "secretKey": ...}]}}
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

_TRUTHY = {"true", "on", "ok", "y", "yes", "1"}


def _env_bool(e: dict[str, str], key: str, default: bool = False) -> bool:
    raw = e.get(key)
    if raw is None:
        return default
    return raw.strip().lower() in _TRUTHY


class EnvConfigurator:
    """Object-store settings straight from environment variables."""

    def __init__(self, env: dict[str, str] | None = None):
        self.env = env if env is not None else dict(os.environ)

    def get_object_store_endpoint(self) -> str:
        endpoint = self.env.get("S3_ENDPOINT", "s3.us-east-1.amazonaws.com")
        if not (endpoint.startswith("https://") or endpoint.startswith("http://")):
            endpoint = "https://" + endpoint
        return endpoint

    def get_object_store_access_key(self, requested_name: str = "") -> str | None:
        return self.env.get("AWS_ACCESS_KEY_ID")

    def get_object_store_secret_key(self, requested_name: str = "") -> str | None:
        return self.env.get("AWS_SECRET_ACCESS_KEY")

    def get_object_store_bucket(self, requested_name: str = "") -> str:
        return self.env.get("REQUESTED_BUCKET", requested_name)

    def get_data_prefix(self) -> str:
        return self.env.get("S3_DATA_PREFIX", "data/parquet/")


@dataclass
class _Bucket:
    name: str = ""
    requested_name: str = ""
    access_key: str | None = None
    secret_key: str | None = None


@dataclass
class _ObjectStore:
    hostname: str = ""
    port: int | None = None
    tls: object = False
    access_key: str | None = None
    secret_key: str | None = None
    buckets: list[_Bucket] = field(default_factory=list)


def _parse_doc(doc: dict) -> _ObjectStore:
    store = doc.get("objectStore", {}) or {}
    return _ObjectStore(
        hostname=store.get("hostname", ""),
        port=store.get("port"),
        tls=store.get("tls", False),
        access_key=store.get("accessKey"),
        secret_key=store.get("secretKey"),
        buckets=[
            _Bucket(
                name=b.get("name", ""),
                requested_name=b.get("requestedName", ""),
                access_key=b.get("accessKey"),
                secret_key=b.get("secretKey"),
            )
            for b in store.get("buckets", [])
        ],
    )


class ProviderConfigurator:
    """Object-store settings from a mounted provider config document."""

    def __init__(self, env: dict[str, str] | None = None, doc: dict | None = None):
        self.env = env if env is not None else dict(os.environ)
        if doc is None:
            path = self.env.get("PROVIDER_CONFIG_PATH")
            if not path:
                raise ValueError(
                    "PROVIDER_CONFIG_ENABLED is set but PROVIDER_CONFIG_PATH is not"
                )
            with open(path) as fh:
                doc = json.load(fh)
        self.store = _parse_doc(doc)

    def _named(self, requested_name: str) -> _Bucket | None:
        if not requested_name:
            return None
        for b in self.store.buckets:
            if b.requested_name == requested_name:
                return b
        return None

    def get_object_store_tls(self) -> bool:
        value = self.store.tls
        if isinstance(value, bool):
            return value
        if isinstance(value, str) and value.lower() in ("true", "false"):
            return value.lower() == "true"
        return False

    def get_object_store_endpoint(self) -> str:
        scheme = "https://" if self.get_object_store_tls() else "http://"
        endpoint = f"{scheme}{self.store.hostname}"
        if bool(self.store.port):
            endpoint += f":{self.store.port}"
        return endpoint

    def get_object_store_access_key(self, requested_name: str = "") -> str | None:
        named = self._named(requested_name)
        if named is not None:
            return named.access_key
        if self.store.buckets:
            return self.store.buckets[0].access_key
        return self.store.access_key

    def get_object_store_secret_key(self, requested_name: str = "") -> str | None:
        named = self._named(requested_name)
        if named is not None:
            return named.secret_key
        if self.store.buckets:
            return self.store.buckets[0].secret_key
        return self.store.secret_key

    def get_object_store_bucket(self, requested_name: str = "") -> str:
        named = self._named(requested_name)
        if named is not None:
            return named.name
        return requested_name

    def get_data_prefix(self) -> str:
        return self.env.get("S3_DATA_PREFIX", "data/parquet/")


def get_configurator(
    env: dict[str, str] | None = None, doc: dict | None = None
) -> EnvConfigurator | ProviderConfigurator:
    """The reference's strategy switch (configurator.py:8-16)."""
    e = env if env is not None else dict(os.environ)
    if _env_bool(e, "PROVIDER_CONFIG_ENABLED", default=False):
        return ProviderConfigurator(env=e, doc=doc)
    return EnvConfigurator(env=e)
