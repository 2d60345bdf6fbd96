"""HTTP service surface — the reference's FastAPI app over SecEngine.

Reference: backend/main.py (FastAPI + Snowflake). Routes reproduced:

  GET  /check-availability?source=&year=&quarter=      (main.py:43-66)
  GET  /get-table-info?data_source=&year=&quarter=     (main.py:68-106)
  POST /execute-custom-query?data_source=   {"query"}  (main.py:109-134)
  GET  /get-financial-data?year=&quarter=&data_type=&source=
                                                       (main.py:137-221)
  GET  /query-data?query=                              (main.py:224-252)

The reference's handlers template Snowflake SQL per request; here each
route delegates to the in-process :class:`~dynaledger_spark.api.SecEngine`
plan (Catalyst executes). Stdlib ``http.server`` keeps the wrapper
dependency-free — FastAPI isn't available in this environment, and the
HTTP layer is deliberately thin: parse params → engine call → JSON.

Threading: handlers run on ThreadingHTTPServer worker threads; py4j calls
into the shared SparkSession are thread-safe, and each collect is a
separate Spark job, so concurrent requests just become concurrent jobs
(FAIR-schedulable via spark.scheduler.mode if a deployment needs it).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from dynaledger_spark.api import SecEngine

# data_source → raw-table-name templates for /get-table-info
# (main.py:80-88). The reference suffixes physical table names per
# quarter; the engine models quarters as a source_file partition, so RAW
# names are unsuffixed while fact/JSON tables keep the reference naming.
_RAW_TABLES = ("sec_num", "sec_pre", "sec_sub", "sec_tag")
_FACT_TABLES = ("BALANCE_SHEET", "INCOME_STATEMENT", "CASH_FLOW")


def _table_names(data_source: str, year: int, quarter: str) -> list[str]:
    tag = f"{year}Q{quarter.replace('Q', '')}"
    if data_source in ("RAW", "Raw"):
        return list(_RAW_TABLES)
    if data_source == "JSON":
        return [f"sec_data_{tag}"]
    if data_source in ("Fact Tables", "FACT TABLES"):
        return [f"{name}_{tag}" for name in _FACT_TABLES]
    raise ValueError(f"Invalid data source: {data_source}")


class _ApiError(Exception):
    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


def _make_handler(engine: SecEngine):
    class Handler(BaseHTTPRequestHandler):
        # Silence per-request stderr logging.
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, status: int, payload) -> None:
            # default=str covers datetime.date / Decimal from Spark rows —
            # same shapes FastAPI's jsonable_encoder stringifies.
            body = json.dumps(payload, default=str).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _params(self) -> dict[str, str]:
            qs = parse_qs(urlparse(self.path).query)
            return {k: v[0] for k, v in qs.items()}

        def _route(self) -> str:
            return urlparse(self.path).path

        def do_GET(self) -> None:  # noqa: N802
            try:
                self._reply(200, self._get(self._route(), self._params()))
            except _ApiError as e:
                self._reply(e.status, {"detail": e.detail})
            except (KeyError, ValueError) as e:
                self._reply(400, {"detail": str(e)})
            except Exception as e:  # pragma: no cover - defensive 500
                self._reply(500, {"detail": str(e)})

        def do_POST(self) -> None:  # noqa: N802
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                self._reply(200, self._post(self._route(), self._params(), body))
            except _ApiError as e:
                self._reply(e.status, {"detail": e.detail})
            except (KeyError, ValueError) as e:
                self._reply(400, {"detail": str(e)})
            except Exception as e:
                # main.py:131 returns a generic 500 on query failure.
                self._reply(500, {"detail": str(e)})

        # ---- routes -----------------------------------------------------
        def _get(self, route: str, p: dict[str, str]):
            if route == "/check-availability":
                return engine.check_availability(int(p["year"]), p["quarter"])
            if route == "/get-table-info":
                names = _table_names(
                    p["data_source"], int(p["year"]), p["quarter"]
                )
                missing = [n for n in names if n not in engine.tables]
                if missing:
                    raise _ApiError(500, f"Failed to fetch table info: {missing}")
                return engine.table_info(names)
            if route == "/get-financial-data":
                return engine.get_financial_data(
                    int(p["year"]), p["quarter"], p["data_type"], p["source"]
                )
            if route == "/query-data":
                # GET twin of POST /execute-custom-query (main.py:224-252):
                # same spark.sql pass-through + float sanitize, query in the
                # query string. FastAPI's Query(..., min_length=1) rejects a
                # missing/empty param with 422 before the handler runs.
                query = p.get("query", "")
                if not query:
                    raise _ApiError(422, "query parameter required (min_length=1)")
                try:
                    return engine.execute_custom_query(query)
                except Exception as e:
                    # main.py:247 wraps ANY query failure as 500/str(e)
                    # (unlike POST's generic message).
                    raise _ApiError(500, str(e))
            raise _ApiError(404, f"Not found: {route}")

        def _post(self, route: str, p: dict[str, str], body: dict):
            if route == "/execute-custom-query":
                if "query" not in body:
                    raise _ApiError(400, "body must contain 'query'")
                return engine.execute_custom_query(body["query"])
            raise _ApiError(404, f"Not found: {route}")

    return Handler


class SecHttpService:
    """Serve a SecEngine over HTTP on a background thread.

    >>> svc = SecHttpService(engine).start()     # port 0 → ephemeral
    >>> ... requests against http://127.0.0.1:{svc.port} ...
    >>> svc.stop()
    """

    def __init__(self, engine: SecEngine, host: str = "127.0.0.1", port: int = 0):
        self._server = ThreadingHTTPServer((host, port), _make_handler(engine))
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "SecHttpService":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="sec-http", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
