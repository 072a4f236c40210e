"""Matroska / WebM (EBML) container metadata — the second video
container family after ISO BMFF (operators/multimodal.mp4_metadata),
built from the public specs: RFC 8794 (EBML) and the Matroska
element registry (matroska.org / IETF cellar drafts).

Same contract as mp4_metadata: this is the PRUNE-BEFORE-DECODE stage
a 100 TB video pipeline runs — filter and route assets by doctype,
codec, resolution, duration WITHOUT touching sample data.  Cluster
payloads (the compressed frames) are skipped structurally; actual
video/audio codec DECODE stays behind the documented stub boundary
(`parse_ok=false` degrade at the operator layer, like every other
codec-bearing format).

EBML structure implemented:

- VINT parsing (RFC 8794 §4): element IDs keep the marker bit,
  element sizes strip it; the all-ones size is UNKNOWN-SIZE (§6.2),
  legal for Segment (streaming muxers emit it) and handled as
  to-end-of-payload.
- Master-element walk: EBML header (DocType / versions) → Segment →
  Info (TimestampScale, Duration, Title, MuxingApp) and Tracks
  (TrackEntry: number, type, CodecID, Video PixelWidth/PixelHeight,
  Audio SamplingFrequency/Channels).
- Scalar decode: big-endian unsigned ints of 0-8 bytes, IEEE floats
  of 4 or 8 bytes (0 bytes = 0.0 per spec defaults), UTF-8 strings.

Scale: Arrow-batched narrow map (`mkv_metadata` operator), no
shuffle; one container resident at a time, Clusters never
materialized beyond their header VINTs.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

#: element IDs (as read, marker bit kept — the registry's notation)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TS_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TITLE = 0x7BA9
_MUXAPP = 0x4D80
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUM = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIX_W = 0xB0
_PIX_H = 0xBA
_AUDIO = 0xE1
_SAMPLE_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675

#: guard: an element claiming more than this many bytes in a metadata
#: walk is hostile (Clusters are skipped by seek, not read)
MAX_ELEMENT_BYTES = 1 << 31


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """(value, new_pos); UNKNOWN size returns -1 (all value bits set)."""
    if pos >= len(data):
        raise ValueError("ebml: truncated VINT")
    first = data[pos]
    if first == 0:
        raise ValueError("ebml: invalid VINT leading byte 0x00")
    length = 1
    mask = 0x80
    while not first & mask:
        mask >>= 1
        length += 1
    if pos + length > len(data):
        raise ValueError("ebml: truncated VINT body")
    if keep_marker:
        val = int.from_bytes(data[pos : pos + length], "big")
    else:
        val = first & (mask - 1)
        for i in range(1, length):
            val = (val << 8) | data[pos + i]
        # all-ones payload = unknown size (RFC 8794 §6.2)
        if val == (1 << (7 * length)) - 1:
            return -1, pos + length
    return val, pos + length


def _uint(body: bytes) -> int:
    if len(body) > 8:
        raise ValueError("ebml: uint wider than 8 bytes")
    return int.from_bytes(body, "big")


def _float(body: bytes) -> float:
    if len(body) == 0:
        return 0.0
    if len(body) == 4:
        return struct.unpack(">f", body)[0]
    if len(body) == 8:
        return struct.unpack(">d", body)[0]
    raise ValueError("ebml: float must be 0/4/8 bytes")


def _children(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) over a master body."""
    pos = start
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        if size < 0:  # unknown-size child: runs to the parent's end
            yield eid, pos, end
            return
        if size > MAX_ELEMENT_BYTES or pos + size > end:
            raise ValueError("ebml: element overruns its parent")
        yield eid, pos, pos + size
        pos += size


def mkv_metadata(payload: bytes) -> dict:
    """Matroska/WebM → ``{doctype, timestamp_scale, duration_s,
    title, muxing_app, n_tracks, tracks: [{number, type, codec,
    width, height, sample_freq, channels}]}``.  ``duration_s`` is
    Duration × TimestampScale / 1e9 (the Matroska rule);
    ``type`` is the registry name for 1/2/17, else the raw int."""
    if len(payload) < 4:
        raise ValueError("ebml: payload too short")
    out: dict = {
        "doctype": None, "timestamp_scale": 1_000_000,
        "duration_s": None, "title": None, "muxing_app": None,
        "n_tracks": 0, "tracks": [],
    }
    duration_raw: float | None = None
    saw_ebml = False
    for eid, s, e in _children(payload, 0, len(payload)):
        if eid == _EBML:
            saw_ebml = True
            for cid, cs, ce in _children(payload, s, e):
                if cid == _DOCTYPE:
                    out["doctype"] = payload[cs:ce].decode("utf-8", "replace")
        elif eid == _SEGMENT:
            for cid, cs, ce in _children(payload, s, e):
                if cid == _INFO:
                    for iid, is_, ie in _children(payload, cs, ce):
                        if iid == _TS_SCALE:
                            out["timestamp_scale"] = _uint(payload[is_:ie])
                        elif iid == _DURATION:
                            duration_raw = _float(payload[is_:ie])
                        elif iid == _TITLE:
                            out["title"] = payload[is_:ie].decode(
                                "utf-8", "replace")
                        elif iid == _MUXAPP:
                            out["muxing_app"] = payload[is_:ie].decode(
                                "utf-8", "replace")
                elif cid == _TRACKS:
                    for tid, ts, te in _children(payload, cs, ce):
                        if tid != _TRACK_ENTRY:
                            continue
                        tr = {"number": None, "type": None, "codec": None,
                              "width": None, "height": None,
                              "sample_freq": None, "channels": None}
                        for fid, fs, fe in _children(payload, ts, te):
                            if fid == _TRACK_NUM:
                                tr["number"] = _uint(payload[fs:fe])
                            elif fid == _TRACK_TYPE:
                                v = _uint(payload[fs:fe])
                                tr["type"] = {1: "video", 2: "audio",
                                              17: "subtitle"}.get(v, v)
                            elif fid == _CODEC_ID:
                                tr["codec"] = payload[fs:fe].decode(
                                    "utf-8", "replace")
                            elif fid == _VIDEO:
                                for vid, vs, ve in _children(
                                        payload, fs, fe):
                                    if vid == _PIX_W:
                                        tr["width"] = _uint(payload[vs:ve])
                                    elif vid == _PIX_H:
                                        tr["height"] = _uint(payload[vs:ve])
                            elif fid == _AUDIO:
                                for aid, as_, ae in _children(
                                        payload, fs, fe):
                                    if aid == _SAMPLE_FREQ:
                                        tr["sample_freq"] = _float(
                                            payload[as_:ae])
                                    elif aid == _CHANNELS:
                                        tr["channels"] = _uint(
                                            payload[as_:ae])
                        out["tracks"].append(tr)
                # Clusters and everything else: skipped structurally
    if not saw_ebml:
        raise ValueError("ebml: no EBML header element")
    if out["doctype"] not in ("matroska", "webm"):
        raise ValueError(f"ebml: unsupported doctype {out['doctype']!r}")
    out["n_tracks"] = len(out["tracks"])
    if duration_raw is not None:
        out["duration_s"] = duration_raw * out["timestamp_scale"] / 1e9
    return out


#: output schema of mkv_video_metadata — one row per asset
MKV_SCHEMA = (
    "asset_id bigint, doctype string, n_tracks int, video_codec string, "
    "width int, height int, audio_codec string, channels int, "
    "duration_s double, title string, parse_ok boolean"
)


def mkv_video_metadata(
    assets: DataFrame, id_col: str = "asset_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-asset Matroska/WebM metadata (MKV_SCHEMA): first video and
    first audio track surfaced flat (the route/filter facts), the
    full track list staying in mkv_metadata for callers that need it.
    Unparseable payloads degrade to parse_ok=false.  Arrow-batched
    narrow map, no shuffle."""
    import pandas as pd

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p) if p is not None else b""
                try:
                    m = mkv_metadata(raw)
                    vid = next((tr for tr in m["tracks"]
                                if tr["type"] == "video"), None)
                    aud = next((tr for tr in m["tracks"]
                                if tr["type"] == "audio"), None)
                    rows.append((
                        int(aid), m["doctype"], m["n_tracks"],
                        vid["codec"] if vid else None,
                        vid["width"] if vid else None,
                        vid["height"] if vid else None,
                        aud["codec"] if aud else None,
                        aud["channels"] if aud else None,
                        m["duration_s"], m["title"], True,
                    ))
                except ValueError:
                    rows.append((int(aid), None, 0, None, None, None,
                                 None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "doctype", "n_tracks", "video_codec",
                         "width", "height", "audio_codec", "channels",
                         "duration_s", "title", "parse_ok"],
            )

    return assets.mapInPandas(_extract, MKV_SCHEMA)


# -- writer twin ---------------------------------------------------------------


def _vint_size(val: int) -> bytes:
    """Encode a SIZE vint in the fewest bytes (marker-bit form)."""
    for length in range(1, 9):
        if val < (1 << (7 * length)) - 1:
            return (val | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("ebml: size too large")


def _elem(eid: int, body: bytes) -> bytes:
    eid_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return eid_bytes + _vint_size(len(body)) + body


def _uint_body(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def build_mkv(
    doctype: str = "matroska",
    title: str | None = None,
    duration_s: float | None = None,
    timestamp_scale: int = 1_000_000,
    video: tuple[str, int, int] | None = None,
    audio_tracks: list[tuple[str, float, int]] | None = None,
    muxing_app: str = "impala-cut-spark",
    unknown_segment_size: bool = False,
) -> bytes:
    """Mux a minimal valid Matroska/WebM metadata container — the
    fixture twin of mkv_metadata.  ``video`` is (codec, w, h);
    ``audio_tracks`` a list of (codec, sample_freq, channels).
    ``unknown_segment_size=True`` writes the Segment with the
    all-ones UNKNOWN size (the streaming-muxer form)."""
    header = _elem(_EBML, _elem(_DOCTYPE, doctype.encode()))
    info_body = _elem(_TS_SCALE, _uint_body(timestamp_scale))
    if duration_s is not None:
        dur = duration_s * 1e9 / timestamp_scale
        info_body += _elem(_DURATION, struct.pack(">d", dur))
    if title is not None:
        info_body += _elem(_TITLE, title.encode())
    info_body += _elem(_MUXAPP, muxing_app.encode())
    tracks_body = b""
    num = 1
    if video is not None:
        codec, w, h = video
        tracks_body += _elem(_TRACK_ENTRY,
                             _elem(_TRACK_NUM, _uint_body(num))
                             + _elem(_TRACK_TYPE, b"\x01")
                             + _elem(_CODEC_ID, codec.encode())
                             + _elem(_VIDEO,
                                     _elem(_PIX_W, _uint_body(w))
                                     + _elem(_PIX_H, _uint_body(h))))
        num += 1
    for codec, freq, ch in audio_tracks or []:
        tracks_body += _elem(_TRACK_ENTRY,
                             _elem(_TRACK_NUM, _uint_body(num))
                             + _elem(_TRACK_TYPE, b"\x02")
                             + _elem(_CODEC_ID, codec.encode())
                             + _elem(_AUDIO,
                                     _elem(_SAMPLE_FREQ,
                                           struct.pack(">d", freq))
                                     + _elem(_CHANNELS, _uint_body(ch))))
        num += 1
    seg_body = (_elem(_INFO, info_body) + _elem(_TRACKS, tracks_body)
                + _elem(_CLUSTER, b"\x00" * 8))  # a stub cluster to skip
    if unknown_segment_size:
        seg = (_SEGMENT.to_bytes(4, "big") + b"\xff" + seg_body)
    else:
        seg = _elem(_SEGMENT, seg_body)
    return header + seg
