"""Streaming HTTP bodies: spooled multipart uploads and chunked file
responses (reference streams uploads through temp files,
app/api/endpoints/videos.py:52-54).

Covers:
- binary fidelity of the incremental multipart parser (chunk-straddling
  boundaries, CRLF/LF framing, fields + files mixed),
- a larger-than-spool-threshold upload over a real socket with bounded
  RSS growth on the server process,
- FileResponse bodies streamed in chunks with correct Content-Length.
"""
import hashlib
import http.client
import io
import os

import pytest

from vtd_tpu.serve.http import (
    SPOOL_THRESHOLD,
    App,
    FileResponse,
    Request,
    Response,
    Server,
    TestClient,
    UploadFile,
    parse_multipart,
    parse_multipart_stream,
)


def _mp_body(parts, boundary=b"B0undary"):
    out = []
    for name, filename, data in parts:
        disp = f'Content-Disposition: form-data; name="{name}"'
        if filename is not None:
            disp += f'; filename="{filename}"'
        out.append(b"--" + boundary + b"\r\n" + disp.encode() + b"\r\n\r\n")
        out.append(data if isinstance(data, bytes) else data.encode())
        out.append(b"\r\n")
    out.append(b"--" + boundary + b"--\r\n")
    return b"".join(out), f"multipart/form-data; boundary={boundary.decode()}"


class _TrickleStream:
    """Feeds the parser tiny reads so boundaries straddle chunk edges."""

    def __init__(self, data, step=7):
        self._data = data
        self._pos = 0
        self._step = step

    def read(self, n=-1):
        take = min(self._step, n if n and n > 0 else self._step)
        chunk = self._data[self._pos:self._pos + take]
        self._pos += len(chunk)
        return chunk


def test_stream_parser_binary_fidelity():
    # payload contains CR/LF bytes and boundary-ish substrings
    payload = bytes(range(256)) * 64 + b"\r\n--B0undar" + b"\x00\r\n" * 33
    body, ctype = _mp_body(
        [("category", None, "driving"), ("file", "clip.bin", payload)]
    )
    fields, files = parse_multipart_stream(_TrickleStream(body), ctype)
    assert fields == {"category": "driving"}
    fname, uf = files["file"]
    assert fname == "clip.bin"
    assert isinstance(uf, UploadFile)
    assert len(uf) == len(payload)
    assert uf.read() == payload
    # chunked iteration reproduces the payload too
    assert b"".join(uf.chunks(1024)) == payload


def test_stream_parser_matches_bytes_parser():
    payload = os.urandom(10_000)
    body, ctype = _mp_body([("file", "x.mp4", payload), ("k", None, "v")])
    fields_b, files_b = parse_multipart(body, ctype)
    assert files_b["file"][1] == payload
    assert fields_b == {"k": "v"}


def test_stream_parser_lf_only_framing():
    boundary = b"bnd"
    body = (
        b"--bnd\nContent-Disposition: form-data; name=\"f\"; filename=\"a\"\n\n"
        b"DATA123\n--bnd--\n"
    )
    _, files = parse_multipart_stream(io.BytesIO(body), "multipart/form-data; boundary=bnd")
    assert files["f"][1].read() == b"DATA123"


def test_lf_headers_with_crlfcrlf_in_body():
    """A bare-LF-headed part whose BINARY body contains CRLFCRLF must
    split headers at the earliest terminator (the LF one), not at the
    CRLF sequence inside the payload."""
    payload = b"front\r\n\r\nback"
    body = (
        b"--bnd\nContent-Disposition: form-data; name=\"f\"; "
        b"filename=\"a\"\n\n" + payload + b"\n--bnd--\n"
    )
    _, files = parse_multipart_stream(
        io.BytesIO(body), "multipart/form-data; boundary=bnd"
    )
    assert files["f"][1].read() == payload


def test_missing_boundary_body_bounded_ram():
    """A body that never contains the declared boundary must stream
    through O(chunk) RAM, not accumulate to O(Content-Length)."""

    class _Counting:
        def __init__(self, total):
            self.left = total

        def read(self, n=-1):
            take = min(self.left, n if n and n > 0 else 65536)
            self.left -= take
            return b"x" * take

    import tracemalloc

    tracemalloc.start()
    fields, files = parse_multipart_stream(
        _Counting(64 * 1024 * 1024),
        "multipart/form-data; boundary=neverappears",
    )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert fields == {} and files == {}
    assert peak < 8 * 1024 * 1024, f"peak {peak/1e6:.0f} MB"


def test_unterminated_part_headers_rejected():
    """Part headers that never terminate are a 400, not an unbounded
    RAM buffer."""
    from vtd_tpu.serve.http import HTTPException

    class _HeaderFlood:
        def __init__(self, total):
            self.sent_preamble = False
            self.left = total

        def read(self, n=-1):
            if not self.sent_preamble:
                self.sent_preamble = True
                return b"--bnd\r\nContent-Disposition: form-data"
            take = min(self.left, n if n and n > 0 else 65536)
            self.left -= take
            return b"a" * take

    with pytest.raises(HTTPException):
        parse_multipart_stream(
            _HeaderFlood(16 * 1024 * 1024),
            "multipart/form-data; boundary=bnd",
        )


def test_request_files_and_form_cached_single_parse(tmp_path):
    payload = b"\x00\x01binary\r\n\r\nstuff"
    body, ctype = _mp_body(
        [("category", None, "sports"), ("file", "v.mp4", payload)]
    )
    req = Request("POST", "/u", {}, {"content-type": ctype}, body=body)
    assert req.form()["category"] == "sports"
    fname, uf = req.files()["file"]
    assert (fname, uf.read()) == ("v.mp4", payload)
    # save_to round-trip
    dst = tmp_path / "out.bin"
    uf.save_to(str(dst))
    assert dst.read_bytes() == payload


@pytest.fixture(scope="module")
def raw_server():
    app = App()
    digests = {}

    @app.post("/upload")
    def upload(request):
        fname, uf = request.files()["file"]
        h = hashlib.md5()
        for chunk in uf.chunks():
            h.update(chunk)
        digests[fname] = h.hexdigest()
        return Response(201, {"filename": fname, "md5": h.hexdigest(),
                              "size": len(uf)})

    @app.get("/download")
    def download(request):
        return FileResponse(request.query["path"], filename="f.bin",
                            media_type="application/octet-stream")

    server = Server(app, "127.0.0.1", 0)
    server.start_background()
    yield server
    server.shutdown()


def test_large_upload_bounded_rss(raw_server, tmp_path):
    """A > spool-threshold upload must not materialize in server RAM."""
    import resource

    size = SPOOL_THRESHOLD * 4  # 32 MB with the 8 MB default
    src = tmp_path / "big.mp4"
    with open(src, "wb") as f:
        block = os.urandom(1024 * 1024)
        for _ in range(size // len(block)):
            f.write(block)
    h = hashlib.md5(src.read_bytes()).hexdigest()

    boundary = "bigb0undary"
    head = (
        f"--{boundary}\r\nContent-Disposition: form-data; "
        f'name="file"; filename="big.mp4"\r\n\r\n'
    ).encode()
    tail = f"\r\n--{boundary}--\r\n".encode()
    total = len(head) + size + len(tail)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    conn = http.client.HTTPConnection("127.0.0.1", raw_server.port)
    conn.putrequest("POST", "/upload")
    conn.putheader("Content-Type", f"multipart/form-data; boundary={boundary}")
    conn.putheader("Content-Length", str(total))
    conn.endheaders()
    conn.send(head)
    with open(src, "rb") as f:
        while True:
            chunk = f.read(1024 * 256)
            if not chunk:
                break
            conn.send(chunk)
    conn.send(tail)
    resp = conn.getresponse()
    import json

    out = json.loads(resp.read())
    assert resp.status == 201
    assert out["md5"] == h
    assert out["size"] == size

    # The server runs in this process (threaded server): RSS growth must
    # stay far below the 32 MB payload (spool+chunk overhead only).
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    growth_mb = (rss1 - rss0) / 1024  # ru_maxrss is KiB on Linux
    assert growth_mb < size / 1024 / 1024 / 2, f"RSS grew {growth_mb:.0f} MB"


def test_file_response_streams_with_content_length(raw_server, tmp_path):
    payload = os.urandom(3 * 1024 * 1024)
    src = tmp_path / "dl.bin"
    src.write_bytes(payload)

    conn = http.client.HTTPConnection("127.0.0.1", raw_server.port)
    conn.request("GET", f"/download?path={src}")
    resp = conn.getresponse()
    assert resp.status == 200
    assert int(resp.getheader("Content-Length")) == len(payload)
    assert resp.getheader("Content-Disposition") == 'attachment; filename="f.bin"'
    assert resp.read() == payload


def test_testclient_upload_still_works(tmp_path):
    """TestClient path (in-memory bytes) flows through the same parser."""
    app = App()

    @app.post("/u")
    def u(request):
        fname, uf = request.files()["file"]
        return Response(200, {"n": fname, "len": len(uf)})

    c = TestClient(app)
    r = c.post("/u", files={"file": ("a.mp4", b"\xff" * 1000)},
               data={"category": "other"})
    assert r.status_code == 200
    assert r.json() == {"n": "a.mp4", "len": 1000}


def test_oversized_form_field_rejected_bounded_ram():
    """A multi-GB NON-file field part must be rejected at the 64 KB cap
    with bounded RAM, not buffered O(Content-Length) into a BytesIO
    (file parts spool to disk; plain fields previously did not)."""
    import pytest

    from vtd_tpu.serve.http import HTTPException

    class _FieldFlood:
        """A valid part header for a plain field, then endless bytes."""

        def __init__(self, total):
            self.head = (
                b"--bnd\r\nContent-Disposition: form-data; "
                b"name=\"category\"\r\n\r\n"
            )
            self.left = total

        def read(self, n=-1):
            n = n if n and n > 0 else 65536
            if self.head:
                out, self.head = self.head[:n], self.head[n:]
                return out
            take = min(self.left, n)
            self.left -= take
            return b"x" * take

    import tracemalloc

    tracemalloc.start()
    with pytest.raises(HTTPException) as ei:
        parse_multipart_stream(
            _FieldFlood(256 * 1024 * 1024),
            "multipart/form-data; boundary=bnd",
        )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert ei.value.status_code == 400
    assert peak < 8 * 1024 * 1024, f"peak {peak/1e6:.0f} MB"


def test_form_field_under_cap_still_parses():
    payload = b"y" * 60_000  # under the 64 KB field cap
    body, ctype = _mp_body([("note", None, payload.decode())])
    fields, files = parse_multipart_stream(io.BytesIO(body), ctype)
    assert fields["note"] == payload.decode()
    assert files == {}
