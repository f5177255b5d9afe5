"""Pure-stdlib WARC/1.x reader + fixture writer — the Common Crawl
front door for the training-data pipeline (web corpora arrive as
``*.warc.gz`` segment files; everything downstream — langid, quality,
dedup, decontamination — starts here).

Same house rules as the other containers (wav/y4m/avi/gif):

- STRICT HEAD: a file whose first record doesn't parse raises
  :class:`WarcError` (a typo'd or non-WARC file must be loud).
- PERMISSIVE TAIL: corruption after at least one good record ends the
  iteration with an ``error`` ROW carrying the parse failure — a
  truncated segment yields its readable prefix, never a dead task.
- gzip transparent: plain ``.warc`` and gzipped input both parse;
  Common Crawl's member-per-record gzip layout decompresses through
  the same path (``gzip.decompress`` walks all members).

Record grammar (ISO 28500): ``WARC/1.x CRLF`` + header lines until a
blank line, a ``Content-Length``-byte payload block, then CRLF CRLF.
``response`` records with an ``application/http`` content type also get
their HTTP status line and Content-Type surfaced, since that's what a
corpus build filters on before HTML extraction.

Reference provenance: the reference pipeline ingests camera frames only
(VideoEventCreator.java); WARC is the engine's LLM-training-data
extension (SURVEY.md §2 sources family, web-corpus leg).
"""

from __future__ import annotations

import gzip
import os
import zlib
from dataclasses import dataclass


class WarcError(ValueError):
    """Unparseable WARC input (strict-head failures)."""


# DDL for the row shape both the batch and streaming format() legs emit.
WARC_RECORDS_DDL = (
    "segment string, record_id string, warc_type string, target_uri string,"
    " warc_date string, content_type string, http_status int,"
    " http_content_type string, content_length long, body binary,"
    " error string"
)

_CRLF = b"\r\n"
_MAX_HEADER_BYTES = 64 * 1024  # one record's header block; hostile-input cap


@dataclass
class WarcRecord:
    record_id: str | None
    warc_type: str | None
    target_uri: str | None
    warc_date: str | None
    content_type: str | None
    http_status: int | None
    http_content_type: str | None
    content_length: int
    body: bytes


def _maybe_gunzip(raw: bytes) -> bytes:
    if raw[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(raw)  # walks ALL members (CC layout)
        except (OSError, EOFError, zlib.error) as e:
            # gzip.decompress leaks EOFError on a truncated stream and
            # zlib.error on corrupt deflate — both must stay inside the
            # WarcError contract (r14 review) or a chopped .gz segment
            # kills the scan task with a foreign exception. Because the
            # whole blob decompresses eagerly, a truncated gzip is a LOUD
            # strict-head failure (zero records parse); salvaging the
            # readable member prefix would need a streaming member walker
            # — the documented trade for the stdlib-only reader.
            raise WarcError(f"gzip layer failed: {e}") from e
    return raw


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise WarcError(f"malformed header line: {line[:60]!r}")
        headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return headers


def _parse_http_payload(body: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, http-body) from an application/http payload;
    (None, None, body) when it doesn't look like HTTP — permissive: the
    WARC record is still valid, only the HTTP view is absent."""
    if not body.startswith(b"HTTP/"):
        return None, None, body
    head, sep, rest = body.partition(_CRLF + _CRLF)
    if not sep:
        return None, None, body
    lines = head.split(_CRLF)
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, body
    ctype = None
    for line in lines[1:]:
        k, s, v = line.partition(b":")
        if s and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
    return status, ctype, rest


def iter_warc_records(raw: bytes):
    """Yield :class:`WarcRecord` for each record. Strict head, permissive
    tail: raises WarcError if record 0 is bad; stops cleanly at EOF or
    raises WarcError mid-stream (callers wrap the tail permissively)."""
    data = _maybe_gunzip(raw)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        line_end = data.find(_CRLF, pos, pos + 32)
        version = data[pos:line_end] if line_end != -1 else data[pos : pos + 32]
        if line_end == -1 or not version.startswith(b"WARC/"):
            raise WarcError(
                f"expected WARC/1.x version line at offset {pos},"
                f" got {version[:20]!r}"
            )
        hdr_end = data.find(_CRLF + _CRLF, line_end, line_end + _MAX_HEADER_BYTES)
        if hdr_end == -1:
            raise WarcError(f"record at {pos}: unterminated header block")
        headers = _parse_headers(data[line_end + 2 : hdr_end])
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise WarcError(f"record at {pos}: missing Content-Length") from None
        except ValueError:
            raise WarcError(f"record at {pos}: bad Content-Length") from None
        if length < 0 or hdr_end + 4 + length > n:
            raise WarcError(f"record at {pos}: truncated payload ({length} bytes)")
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        ctype = headers.get("content-type")
        status, http_ctype, http_body = (
            _parse_http_payload(body)
            if ctype and ctype.startswith("application/http")
            else (None, None, body)
        )
        if status is not None:
            # for http records the useful payload is the HTTP BODY — the
            # headers are already surfaced as columns; content_length
            # still reports the record's declared (full-payload) length
            body = http_body
        yield WarcRecord(
            record_id=headers.get("warc-record-id"),
            warc_type=headers.get("warc-type"),
            target_uri=headers.get("warc-target-uri"),
            warc_date=headers.get("warc-date"),
            content_type=ctype,
            http_status=status,
            http_content_type=http_ctype,
            content_length=length,
            body=body,
        )


def warc_record_rows(path: str, raw: bytes):
    """Per-file row builder (the ``audio_feature_row`` analog) carrying
    BOTH halves of the module contract (ADVICE r13): STRICT HEAD — a
    file whose FIRST record fails to parse re-raises :class:`WarcError`,
    so a directory of non-WARC files fails the task loudly instead of
    dissolving into quiet error rows; PERMISSIVE TAIL — once at least
    one record parsed, a later failure becomes one error ROW (readable
    prefix preserved) and ends the file. Same contract whichever ingest
    path (binaryFile or format('warc')) runs it."""
    segment = os.path.basename(path)
    yielded_good = False
    try:
        for r in iter_warc_records(raw):
            yielded_good = True
            yield (
                segment,
                r.record_id,
                r.warc_type,
                r.target_uri,
                r.warc_date,
                r.content_type,
                r.http_status,
                r.http_content_type,
                r.content_length,
                r.body,
                None,
            )
    except WarcError as e:
        if not yielded_good:
            raise  # strict head: record 0 bad -> the whole file is loud
        # tail rows were already yielded; one error row closes the file
        yield (
            segment,
            None,
            None,
            None,
            None,
            None,
            None,
            None,
            None,
            None,
            f"WarcError: {e}",
        )


def build_warc(records: list[dict], gzipped: bool = False) -> bytes:
    """Fixture writer: each record dict takes ``warc_type`` plus optional
    ``target_uri``, ``record_id``, ``date``, ``content_type``, ``body``
    (bytes). ``http`` records may pass ``status``/``http_content_type``/
    ``http_body`` to get a well-formed application/http payload."""
    out = bytearray()
    for i, rec in enumerate(records):
        if "http_body" in rec:
            body = (
                b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\n\r\n"
                % (
                    rec.get("status", 200),
                    rec.get("http_content_type", "text/html").encode(),
                )
                + rec["http_body"]
            )
            ctype = "application/http; msgtype=response"
        else:
            body = rec.get("body", b"")
            ctype = rec.get("content_type", "application/octet-stream")
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + rec["warc_type"].encode(),
            b"WARC-Record-ID: "
            + rec.get("record_id", f"<urn:uuid:rec-{i}>").encode(),
            b"WARC-Date: " + rec.get("date", "2026-01-01T00:00:00Z").encode(),
            b"Content-Type: " + ctype.encode(),
            b"Content-Length: " + str(len(body)).encode(),
        ]
        if rec.get("target_uri"):
            headers.insert(2, b"WARC-Target-URI: " + rec["target_uri"].encode())
        out += _CRLF.join(headers) + _CRLF + _CRLF + body + _CRLF + _CRLF
    raw = bytes(out)
    return gzip.compress(raw, mtime=0) if gzipped else raw
