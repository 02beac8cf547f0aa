"""Typed pipeline configuration (SURVEY §2.1 R12).

Reproduces the reference's env-var config resolution
(/root/reference/etl_connector.py:23-34: seven env vars with defaults,
fail-fast when the API key is missing) as an explicit dataclass with no
import-time side effects.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


class ConfigError(ValueError):
    """Raised when required configuration is missing (fail-fast, R12)."""


def parse_dotenv(path: str) -> dict[str, str]:
    """Minimal ``.env`` parser reproducing the reference's ``load_dotenv()``
    (etl_connector.py:23; python-dotenv file syntax): KEY=VALUE lines,
    ``#`` comments, optional ``export`` prefix, single/double quotes
    stripped, inline comments dropped from unquoted values. Returns {} for
    a missing file, exactly like load_dotenv's silent no-op."""
    if not os.path.exists(path):
        return {}
    out: dict[str, str] = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):].strip()
            key, _, val = line.partition("=")
            key, val = key.strip(), val.strip()
            if len(val) >= 2 and val[0] == val[-1] and val[0] in "'\"":
                val = val[1:-1]
            else:
                val = val.split(" #", 1)[0].rstrip()
            if key:
                out[key] = val
    return out


@dataclass(frozen=True)
class PipelineConfig:
    """Connector/pipeline configuration.

    Mirrors the reference's config surface (etl_connector.py:25-31):
    api key, base url, connector name, city tag, plus the operational
    envelope constants (per_page/max_pages etl_connector.py:88, batch_size
    etl_connector.py:206, retry policy etl_connector.py:53-58).
    """

    api_key: str = ""
    base_url: str = "https://otx.alienvault.com/api/v1"
    connector_name: str = "otx_connector"
    source: str = "otx"
    city: str = ""
    per_page: int = 50
    max_pages: int = 100
    batch_size: int = 20
    max_retries: int = 5
    request_timeout_s: float = 30.0
    backoff_initial_s: float = 1.0
    backoff_multiplier: float = 2.0
    # Reader parallelism: pages fetched per Spark partition. The reference is
    # strictly serial (1 thread); at scale N partitions would hammer one API,
    # so default to coarse partitions (politeness) and let users widen.
    pages_per_partition: int = 10
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_env(
        cls,
        env: dict[str, str] | None = None,
        require_api_key: bool = True,
        dotenv_path: str | None = ".env",
    ) -> "PipelineConfig":
        """Resolve from environment, reproducing etl_connector.py:25-34,
        including the reference's ``load_dotenv()`` (:23): values from
        ``dotenv_path`` fill in keys absent from the process environment
        (load_dotenv's default override=False precedence); a missing file
        is a silent no-op. Pass ``dotenv_path=None`` to skip."""
        e = env if env is not None else dict(os.environ)
        if dotenv_path is not None:
            e = {**parse_dotenv(dotenv_path), **e}
        api_key = e.get("OTX_API_KEY", "")
        if require_api_key and not api_key:
            raise ConfigError("OTX_API_KEY is required (reference fails fast, etl_connector.py:33-34)")
        return cls(
            api_key=api_key,
            base_url=e.get("OTX_BASE_URL", cls.base_url),
            connector_name=e.get("CONNECTOR_NAME", cls.connector_name),
            city=e.get("CITY", ""),
        )
