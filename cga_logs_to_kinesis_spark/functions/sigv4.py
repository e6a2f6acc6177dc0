"""AWS Signature Version 4 signing — pure stdlib (K2).

The reference carries a vendored Go implementation (sign.go:49-120:
canonical request → string-to-sign → HMAC-SHA256 key-derivation chain
→ Authorization header); this is the same published algorithm
(https://docs.aws.amazon.com/general/latest/gr/sigv4_signing.html)
re-expressed in Python with ``hashlib``/``hmac`` only, verified
against the worked example in the AWS documentation
(tests/test_sigv4.py pins the canonical-request hash, the derived
signing key, and the final signature byte-for-byte).

The transports still delegate to boto3 when it is present — a
battle-tested signer beats a hand-rolled one in production — but the
algorithm itself is no longer a black box: ``sign_request`` produces
a complete Authorization header a Kinesis/Firehose REST call could
use directly, which is exactly the role sign.go plays for the
reference binary.
"""

from __future__ import annotations

import hashlib
import hmac
import urllib.parse
from dataclasses import dataclass, field

ALGORITHM = "AWS4-HMAC-SHA256"


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def _uri_encode(s: str, *, is_path: bool) -> str:
    # SigV4's encoding set: unreserved chars stay, '/' survives only
    # in paths; spaces become %20 (never '+').
    safe = "-_.~" + ("/" if is_path else "")
    return urllib.parse.quote(s, safe=safe)


def canonical_request(method: str, path: str,
                      query: list[tuple[str, str]],
                      headers: dict[str, str],
                      payload: bytes) -> tuple[str, str]:
    """The canonical request string and the signed-headers list.

    Headers are lowercased, values trimmed with internal runs of
    spaces collapsed, sorted by name; query pairs are URI-encoded
    then sorted by encoded (name, value) — the published
    canonicalization rules, the part every hand-rolled signer gets
    subtly wrong first."""
    canon_q = "&".join(
        f"{k}={v}" for k, v in sorted(
            (_uri_encode(k, is_path=False), _uri_encode(v, is_path=False))
            for k, v in query))
    norm = {k.lower().strip(): " ".join(v.strip().split())
            for k, v in headers.items()}
    signed = ";".join(sorted(norm))
    canon_h = "".join(f"{k}:{norm[k]}\n" for k in sorted(norm))
    cr = "\n".join([
        method.upper(),
        _uri_encode(path or "/", is_path=True),
        canon_q,
        canon_h,
        signed,
        _sha256_hex(payload),
    ])
    return cr, signed


def string_to_sign(amz_date: str, scope: str,
                   canon_request: str) -> str:
    return "\n".join([ALGORITHM, amz_date, scope,
                      _sha256_hex(canon_request.encode())])


def derive_signing_key(secret_key: str, date: str, region: str,
                       service: str) -> bytes:
    """kSigning = HMAC(HMAC(HMAC(HMAC("AWS4"+secret, date), region),
    service), "aws4_request") — the four-step chain of sign.go:49-76."""
    k_date = _hmac(("AWS4" + secret_key).encode(), date)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    return _hmac(k_service, "aws4_request")


@dataclass(frozen=True)
class SignedRequest:
    authorization: str
    amz_date: str
    signed_headers: str
    signature: str
    canonical_request: str = field(repr=False, default="")
    string_to_sign: str = field(repr=False, default="")


def sign_request(*, access_key: str, secret_key: str, region: str,
                 service: str, method: str, path: str,
                 query: list[tuple[str, str]] | None = None,
                 headers: dict[str, str], payload: bytes = b"",
                 session_token: str | None = None) -> SignedRequest:
    """Produce the Authorization header for one request.  ``headers``
    must already include Host and X-Amz-Date (the caller owns the
    clock); a session token is signed as X-Amz-Security-Token exactly
    like the reference's STS path (sign.go + auth_assumerole.go)."""
    headers = dict(headers)
    if session_token is not None:
        headers["X-Amz-Security-Token"] = session_token
    amz_date = next(v for k, v in headers.items()
                    if k.lower() == "x-amz-date")
    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    cr, signed = canonical_request(method, path, query or [],
                                   headers, payload)
    sts = string_to_sign(amz_date, scope, cr)
    key = derive_signing_key(secret_key, date, region, service)
    sig = hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()
    auth = (f"{ALGORITHM} Credential={access_key}/{scope}, "
            f"SignedHeaders={signed}, Signature={sig}")
    return SignedRequest(auth, amz_date, signed, sig, cr, sts)
