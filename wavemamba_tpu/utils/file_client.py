"""Storage backends (`basicsr/utils/file_client.py`): disk + LMDB facade.

LMDB (a C library) is optional in this environment — the backend raises a
clear error if the `lmdb` package is absent. Memcached is intentionally not
supported (dead weight in the reference; use disk or lmdb)."""

from __future__ import annotations


class DiskBackend:
    def get(self, filepath, client_key=None):
        with open(str(filepath), "rb") as f:
            return f.read()

    def get_text(self, filepath):
        with open(str(filepath), "r") as f:
            return f.read()


class LmdbBackend:
    """Read-only LMDB env per db (`file_client.py:74-130`)."""

    def __init__(self, db_paths, client_keys="default", readonly=True, lock=False,
                 readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError("lmdb backend requires the 'lmdb' package") from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {}
        for key, path in zip(client_keys, db_paths):
            self._client[key] = lmdb.open(
                str(path), readonly=readonly, lock=lock, readahead=readahead, **kwargs
            )

    def get(self, filepath, client_key):
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))

    def get_text(self, filepath):
        raise NotImplementedError


class FileClient:
    """Facade (`file_client.py:132-167`)."""

    _backends = {"disk": DiskBackend, "lmdb": LmdbBackend}

    def __init__(self, backend="disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"Backend {backend} is not supported. Currently supported ones are "
                f"{list(self._backends)}"
            )
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key="default"):
        if self.backend == "lmdb":
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath):
        return self.client.get_text(filepath)
