"""Minimal HTTP framework (stdlib-only).

The reference serves with FastAPI + uvicorn; neither is available in
this image, so this module provides the small subset the API surface
needs: a threaded HTTP server, a router with ``{param}`` path segments,
JSON request/response objects, multipart/form-data and
x-www-form-urlencoded parsing (for uploads and OAuth2 password forms),
an ``HTTPException`` with FastAPI-compatible ``{"detail": ...}`` bodies,
and a middleware chain.

Middleware protocol: ``middleware(request, call_next) -> Response`` —
the same onion model as Starlette's BaseHTTPMiddleware, so the
middleware stack order from the reference (``app/main.py:75-79``)
carries over directly.
"""
from __future__ import annotations

import json
import logging
import re
import threading
import traceback
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

logger = logging.getLogger(__name__)


class HTTPException(Exception):
    def __init__(self, status_code: int, detail: str = "", headers=None):
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail
        self.headers = headers or {}


@dataclass
class Request:
    method: str
    path: str
    query: Dict[str, str]
    headers: Dict[str, str]
    body: bytes = b""
    path_params: Dict[str, str] = field(default_factory=dict)
    client_ip: str = ""
    state: Dict[str, Any] = field(default_factory=dict)

    def json(self) -> Any:
        if not self.body:
            return {}
        try:
            return json.loads(self.body.decode("utf-8"))
        except (ValueError, UnicodeDecodeError):
            raise HTTPException(400, "Invalid JSON body")

    def form(self) -> Dict[str, str]:
        ctype = self.headers.get("content-type", "")
        if "application/x-www-form-urlencoded" in ctype:
            parsed = parse_qs(self.body.decode("utf-8"), keep_blank_values=True)
            return {k: v[0] for k, v in parsed.items()}
        if "multipart/form-data" in ctype:
            fields, _ = parse_multipart(self.body, ctype)
            return fields
        return {}

    def files(self) -> Dict[str, Tuple[str, bytes]]:
        ctype = self.headers.get("content-type", "")
        if "multipart/form-data" in ctype:
            _, files = parse_multipart(self.body, ctype)
            return files
        return {}


@dataclass
class Response:
    status_code: int = 200
    content: Any = None
    headers: Dict[str, str] = field(default_factory=dict)
    media_type: str = "application/json"
    body_bytes: Optional[bytes] = None

    def render(self) -> bytes:
        if self.body_bytes is not None:
            return self.body_bytes
        if self.content is None:
            return b""
        if isinstance(self.content, (bytes, bytearray)):
            return bytes(self.content)
        if isinstance(self.content, str):
            return self.content.encode("utf-8")
        return json.dumps(self.content, default=str).encode("utf-8")


def FileResponse(path: str, filename: str = "", media_type: str = "application/octet-stream") -> Response:
    with open(path, "rb") as f:
        data = f.read()
    headers = {}
    if filename:
        headers["Content-Disposition"] = f'attachment; filename="{filename}"'
    return Response(200, None, headers, media_type, body_bytes=data)


def parse_multipart(
    body: bytes, content_type: str
) -> Tuple[Dict[str, str], Dict[str, Tuple[str, bytes]]]:
    """Parse multipart/form-data. Returns (fields, files) where files
    maps field name -> (filename, bytes)."""
    m = re.search(r"boundary=([^;]+)", content_type)
    if not m:
        raise HTTPException(400, "Malformed multipart body")
    boundary = m.group(1).strip('"').encode()
    fields: Dict[str, str] = {}
    files: Dict[str, Tuple[str, bytes]] = {}
    segments = body.split(b"--" + boundary)
    for part in segments[1:]:
        if part.startswith(b"--"):
            break  # closing delimiter "--boundary--"
        # The CRLF after the delimiter line and the CRLF before the next
        # delimiter are framing, not content: remove exactly one of each
        # (strip() would eat trailing 0x0a/0x0d bytes of binary payloads).
        if part.startswith(b"\r\n"):
            part = part[2:]
        elif part.startswith(b"\n"):
            part = part[1:]
        if part.endswith(b"\r\n"):
            part = part[:-2]
        elif part.endswith(b"\n"):
            part = part[:-1]
        if not part:
            continue
        if b"\r\n\r\n" not in part:
            continue
        raw_headers, data = part.split(b"\r\n\r\n", 1)
        disp = ""
        for line in raw_headers.split(b"\r\n"):
            if line.lower().startswith(b"content-disposition"):
                disp = line.decode("utf-8", "replace")
        name_m = re.search(r'name="([^"]*)"', disp)
        if not name_m:
            continue
        name = name_m.group(1)
        file_m = re.search(r'filename="([^"]*)"', disp)
        if file_m:
            files[name] = (file_m.group(1), data)
        else:
            fields[name] = data.decode("utf-8", "replace")
    return fields, files


Handler = Callable[[Request], Response]
Middleware = Callable[[Request, Callable[[Request], Response]], Response]


class Route:
    _PARAM_RE = re.compile(r"{(\w+)}")

    def __init__(self, method: str, pattern: str, handler: Handler):
        self.method = method
        self.handler = handler
        regex = self._PARAM_RE.sub(r"(?P<\1>[^/]+)", pattern.rstrip("/") or "/")
        self.regex = re.compile("^" + regex + "/?$")

    def match(self, method: str, path: str):
        if method != self.method:
            return None
        return self.regex.match(path)


class App:
    """Router + middleware chain + exception handling."""

    def __init__(self):
        self.routes: List[Route] = []
        self.middleware: List[Middleware] = []
        self.mounts: List[Tuple[str, Handler]] = []
        self.on_startup: List[Callable[[], None]] = []

    # -- registration ---------------------------------------------------
    def route(self, method: str, pattern: str):
        def deco(fn: Handler) -> Handler:
            self.routes.append(Route(method, pattern, fn))
            return fn

        return deco

    def get(self, pattern):
        return self.route("GET", pattern)

    def post(self, pattern):
        return self.route("POST", pattern)

    def put(self, pattern):
        return self.route("PUT", pattern)

    def delete(self, pattern):
        return self.route("DELETE", pattern)

    def mount(self, prefix: str, handler: Handler):
        self.mounts.append((prefix, handler))

    def add_middleware(self, mw: Middleware):
        """Innermost-first, matching FastAPI's add_middleware semantics
        (the last one added sees the request first)."""
        self.middleware.append(mw)

    # -- dispatch ---------------------------------------------------------
    def _find(self, request: Request) -> Handler:
        for prefix, handler in self.mounts:
            if request.path.startswith(prefix):
                return handler
        allowed = []
        for route in self.routes:
            m = route.match(request.method, request.path)
            if m:
                request.path_params = m.groupdict()
                return route.handler
            if route.regex.match(request.path):
                allowed.append(route.method)
        if allowed:
            raise HTTPException(405, "Method not allowed")
        raise HTTPException(404, "Not found")

    def handle(self, request: Request) -> Response:
        def endpoint(req: Request) -> Response:
            handler = self._find(req)
            return handler(req)

        call = endpoint
        for mw in self.middleware:
            call = (lambda m, nxt: lambda req: m(req, nxt))(mw, call)

        try:
            return call(request)
        except HTTPException as exc:
            # FastAPI-compatible error body (reference app/main.py:108-121)
            return Response(
                exc.status_code,
                {
                    "detail": exc.detail,
                    "status_code": exc.status_code,
                    "path": request.path,
                },
                headers=exc.headers,
            )
        except Exception:
            logger.error("Unhandled exception:\n%s", traceback.format_exc())
            return Response(
                500,
                {
                    "detail": "Internal server error",
                    "status_code": 500,
                    "path": request.path,
                },
            )


class _HTTPHandler(BaseHTTPRequestHandler):
    app: App = None  # type: ignore
    protocol_version = "HTTP/1.1"

    def _run(self):
        parsed = urlparse(self.path)
        query = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length) if length else b""
        request = Request(
            method=self.command,
            path=parsed.path,
            query=query,
            headers={k.lower(): v for k, v in self.headers.items()},
            body=body,
            client_ip=self.client_address[0],
        )
        response = self.app.handle(request)
        payload = response.render()
        self.send_response(response.status_code)
        self.send_header("Content-Type", response.media_type)
        self.send_header("Content-Length", str(len(payload)))
        for k, v in response.headers.items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(payload)

    do_GET = do_POST = do_PUT = do_DELETE = do_PATCH = do_OPTIONS = _run

    def log_message(self, fmt, *args):  # route through logging, not stderr
        logger.debug(fmt, *args)


class Server:
    """Threaded HTTP server wrapper."""

    def __init__(self, app: App, host: str = "0.0.0.0", port: int = 8000):
        handler = type("BoundHandler", (_HTTPHandler,), {"app": app})
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.app = app
        self.thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start_background(self):
        for fn in self.app.on_startup:
            fn()
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()

    def serve_forever(self):
        for fn in self.app.on_startup:
            fn()
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()


class TestClient:
    """In-process client (no socket): the fake-backend test strategy of
    the reference's ``fastapi.testclient`` usage (tests/test_api.py)."""

    def __init__(self, app: App):
        self.app = app
        for fn in app.on_startup:
            fn()

    def request(
        self,
        method: str,
        path: str,
        json_body: Any = None,
        data: Optional[Dict[str, str]] = None,
        files: Optional[Dict[str, Tuple[str, bytes]]] = None,
        headers: Optional[Dict[str, str]] = None,
        params: Optional[Dict[str, Any]] = None,
    ) -> Response:
        headers = {k.lower(): v for k, v in (headers or {}).items()}
        body = b""
        if json_body is not None:
            body = json.dumps(json_body).encode()
            headers["content-type"] = "application/json"
        elif files is not None:
            boundary = "testboundary123"
            parts = []
            for k, v in (data or {}).items():
                parts.append(
                    f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"\r\n\r\n{v}\r\n'.encode()
                )
            for k, (fname, fdata) in files.items():
                parts.append(
                    f'--{boundary}\r\nContent-Disposition: form-data; name="{k}"; filename="{fname}"\r\n\r\n'.encode()
                    + fdata
                    + b"\r\n"
                )
            parts.append(f"--{boundary}--\r\n".encode())
            body = b"".join(parts)
            headers["content-type"] = f"multipart/form-data; boundary={boundary}"
        elif data is not None:
            from urllib.parse import urlencode

            body = urlencode(data).encode()
            headers["content-type"] = "application/x-www-form-urlencoded"

        parsed = urlparse(path)
        query = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        if params:
            query.update({k: str(v) for k, v in params.items()})
        req = Request(
            method=method,
            path=parsed.path,
            query=query,
            headers=headers,
            body=body,
            client_ip="127.0.0.1",
        )
        resp = self.app.handle(req)
        resp.json = lambda: json.loads(resp.render() or b"null")  # type: ignore
        return resp

    def get(self, path, **kw):
        return self.request("GET", path, **kw)

    def post(self, path, **kw):
        return self.request("POST", path, **kw)

    def put(self, path, **kw):
        return self.request("PUT", path, **kw)

    def delete(self, path, **kw):
        return self.request("DELETE", path, **kw)
