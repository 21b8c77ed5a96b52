"""Remote weight connectors: serve a model straight from a URI.

Capability parity with the reference's ``srt/connector/`` (BaseConnector
+ redis/s3 backends consumed by ``RemoteModelLoader``,
``model_loader/loader.py:1271``): ``--model-path file://...``,
``redis://host:port/prefix`` or ``s3://bucket/prefix`` pulls the
checkpoint files (config/tokenizer/safetensors) into a local cache dir
and loads from there.  redis/s3 need their client libraries; they fail
with a clear install hint when absent (not bundled in this image).
"""

from __future__ import annotations

import logging
import os
import shutil
import tempfile
from abc import ABC, abstractmethod
from typing import List, Optional
from urllib.parse import urlparse

logger = logging.getLogger(__name__)

_SCHEMES = ("file", "redis", "s3")


def is_remote_url(path: str) -> bool:
    return any(path.startswith(s + "://") for s in _SCHEMES)


class BaseConnector(ABC):
    """Pulls checkpoint files for one model URI into a local dir."""

    def __init__(self, url: str):
        self.url = url
        parsed = urlparse(url)
        self.local_dir = os.path.join(
            tempfile.gettempdir(),
            "sgl_tpu_remote",
            (parsed.netloc + parsed.path).strip("/").replace("/", "_"),
        )

    @abstractmethod
    def list_files(self) -> List[str]:
        """Relative file names under the URI."""

    @abstractmethod
    def fetch(self, name: str, dest: str) -> None:
        """Copy one remote file to ``dest``."""

    def pull_files(self, allow_patterns: Optional[List[str]] = None) -> str:
        import fnmatch

        os.makedirs(self.local_dir, exist_ok=True)
        for name in self.list_files():
            if allow_patterns and not any(
                fnmatch.fnmatch(name, p) for p in allow_patterns
            ):
                continue
            dest = os.path.join(self.local_dir, name)
            if os.path.exists(dest):
                continue  # cached from a previous pull
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            self.fetch(name, dest)
        return self.local_dir

    def close(self) -> None:
        pass


class FileConnector(BaseConnector):
    """file:///abs/dir — local checkout treated as a remote (also the
    test double for the redis/s3 paths)."""

    def __init__(self, url: str):
        super().__init__(url)
        self.src = urlparse(url).path

    def list_files(self) -> List[str]:
        out = []
        for root, _, files in os.walk(self.src):
            for f in files:
                out.append(
                    os.path.relpath(os.path.join(root, f), self.src)
                )
        return out

    def fetch(self, name: str, dest: str) -> None:
        shutil.copyfile(os.path.join(self.src, name), dest)


class RedisConnector(BaseConnector):
    """redis://host:port/prefix — one key per file under ``prefix/``
    (reference ``connector/redis.py`` layout)."""

    def __init__(self, url: str):
        super().__init__(url)
        try:
            import redis
        except ImportError as e:  # pragma: no cover - lib not in image
            raise ImportError(
                "redis:// model paths need the redis client: pip install redis"
            ) from e
        parsed = urlparse(url)
        self.prefix = parsed.path.strip("/")
        self.client = redis.Redis(
            host=parsed.hostname or "localhost", port=parsed.port or 6379
        )

    def list_files(self) -> List[str]:
        pre = f"{self.prefix}/"
        return [
            k.decode()[len(pre):]
            for k in self.client.keys(pre + "*")
        ]

    def fetch(self, name: str, dest: str) -> None:
        data = self.client.get(f"{self.prefix}/{name}")
        if data is None:
            raise FileNotFoundError(f"{self.url}/{name}")
        with open(dest, "wb") as f:
            f.write(data)

    def close(self) -> None:
        self.client.close()


class S3Connector(BaseConnector):
    """s3://bucket/prefix (reference ``connector/s3.py``)."""

    def __init__(self, url: str):
        super().__init__(url)
        try:
            import boto3
        except ImportError as e:  # pragma: no cover - lib not in image
            raise ImportError(
                "s3:// model paths need boto3: pip install boto3"
            ) from e
        parsed = urlparse(url)
        self.bucket = parsed.netloc
        self.prefix = parsed.path.strip("/")
        self.client = boto3.client("s3")

    def list_files(self) -> List[str]:
        pre = self.prefix + "/" if self.prefix else ""
        out = []
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=self.bucket, Prefix=pre):
            for obj in page.get("Contents", []):
                out.append(obj["Key"][len(pre):])
        return out

    def fetch(self, name: str, dest: str) -> None:
        pre = self.prefix + "/" if self.prefix else ""
        self.client.download_file(self.bucket, pre + name, dest)


def create_remote_connector(url: str) -> BaseConnector:
    scheme = urlparse(url).scheme
    if scheme == "file":
        return FileConnector(url)
    if scheme == "redis":
        return RedisConnector(url)
    if scheme == "s3":
        return S3Connector(url)
    raise ValueError(f"unsupported remote scheme {scheme!r} in {url}")


def pull_remote_model(url: str) -> str:
    """Materialize a remote model URI locally; returns the local dir."""
    conn = create_remote_connector(url)
    try:
        local = conn.pull_files(
            allow_patterns=["*.json", "*.safetensors", "*.gguf", "*.model",
                            "*.txt", "*.jinja"]
        )
    finally:
        conn.close()
    logger.info("pulled remote model %s -> %s", url, local)
    return local
