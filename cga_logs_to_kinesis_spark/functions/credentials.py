"""Credential chain (K3) — pure stdlib.

The reference resolves credentials as: static env keys → EC2
instance-metadata role → optional STS AssumeRole, each wrapped in an
expiry-aware mutexed cache (main.go:64-79, auth_static.go,
auth_metadata.go, auth_assumerole.go, auth_cachedmutexedwarmedup.go).
This module re-expresses that chain with the same division:

* :class:`StaticEnvProvider` — AWS_ACCESS_KEY_ID / SECRET / TOKEN;
* :class:`InstanceMetadataProvider` — the real two-GET metadata dance
  (role name off the security-credentials listing, then that role's
  credential JSON — auth_metadata.go:25-52), against an injectable
  endpoint URL: unset, it honors the public
  ``AWS_EC2_METADATA_SERVICE_ENDPOINT`` env var and otherwise raises
  an actionable :class:`CredentialResolutionError` rather than
  hanging on a 169.254.169.254 that this container cannot reach;
* :class:`AssumeRoleProvider` — a ``sts:AssumeRole`` request built
  exactly like auth_assumerole.go:16-23 (query-string action, empty
  body, SigV4-signed with the base credentials via
  functions/sigv4.py) and the XML response parsed for the temporary
  key triple + Expiration; endpoint injectable for the same reason;
* :class:`ChainProvider` — first provider that resolves wins;
* :class:`CachedProvider` — the cachedmutexedwarmedup shape: a lock
  around refresh, credentials reused until ``refresh_window`` before
  expiry, injectable clock so the expiry behavior is TESTED rather
  than waited for.  A refresh failure inside the window serves the
  still-valid cached credentials (the reference only ever refreshes
  PAST expiry, so a transient STS blip there never fails a request
  early; the early-refresh window here must not either).

Both network providers are tested against a local ``http.server``
fake (tests/test_sigv4.py) — the fetch-and-parse step is code, not
documentation; only the default endpoints are environment-gated.
The signer (functions/sigv4.py) consumes the resolved credentials;
production transports still prefer boto3's chain when present.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from datetime import datetime, timezone


class CredentialResolutionError(Exception):
    """No provider in the chain could produce credentials."""


@dataclass(frozen=True)
class Credentials:
    access_key: str
    secret_key: str
    session_token: str | None = None
    expiry: float | None = None        # epoch seconds; None = static

    def expires_within(self, seconds: float, now: float) -> bool:
        return self.expiry is not None and self.expiry - now <= seconds


class Provider:
    def get(self) -> Credentials:
        raise NotImplementedError


class StaticEnvProvider(Provider):
    """auth_static.go: the environment pair, never expiring."""

    def __init__(self, env: dict | None = None):
        self.env = env if env is not None else os.environ

    def get(self) -> Credentials:
        access = self.env.get("AWS_ACCESS_KEY_ID", "")
        secret = self.env.get("AWS_SECRET_ACCESS_KEY", "")
        if not access or not secret:
            raise CredentialResolutionError(
                "AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY not set")
        return Credentials(access, secret,
                           self.env.get("AWS_SESSION_TOKEN") or None)


def _parse_rfc3339(s: str) -> float:
    """RFC3339 → epoch seconds (auth_metadata.go parses Expiration
    with time.RFC3339; 'Z' normalized for pre-3.11 fromisoformat)."""
    dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def _http_get(url: str, timeout: float) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        if resp.status != 200:
            raise CredentialResolutionError(
                f"GET {url} -> HTTP {resp.status}")
        return resp.read()


IMDS_CREDS_PATH = "/latest/meta-data/iam/security-credentials"


class InstanceMetadataProvider(Provider):
    """auth_metadata.go:25-52: the instance-role credentials.

    The two-GET dance: ``{endpoint}/latest/meta-data/iam/
    security-credentials`` lists the instance's roles (first line
    wins, matching retrieveIAMRole), then ``.../{role}`` returns the
    credential JSON (AccessKeyId, SecretAccessKey, Token,
    Expiration).  ``endpoint`` defaults to the public
    AWS_EC2_METADATA_SERVICE_ENDPOINT env var; with neither set the
    provider raises immediately — attempting http://169.254.169.254
    from this container would block for the full timeout on every
    chain resolution.
    """

    def __init__(self, endpoint: str | None = None,
                 timeout: float = 2.0, env: dict | None = None):
        env = env if env is not None else os.environ
        self.endpoint = (endpoint or
                         env.get("AWS_EC2_METADATA_SERVICE_ENDPOINT")
                         or None)
        self.timeout = timeout

    def get(self) -> Credentials:
        if not self.endpoint:
            raise CredentialResolutionError(
                "no EC2 instance-metadata endpoint configured "
                "(set AWS_EC2_METADATA_SERVICE_ENDPOINT or pass "
                "endpoint=); chain falls through")
        base = self.endpoint.rstrip("/") + IMDS_CREDS_PATH
        try:
            listing = _http_get(base, self.timeout).decode()
            role = listing.split("\n")[0].strip()
            if not role:
                raise CredentialResolutionError(
                    "unable to retrieve IAM role (empty listing)")
            data = json.loads(_http_get(
                f"{base}/{urllib.parse.quote(role)}", self.timeout))
        except (urllib.error.URLError, OSError, ValueError) as e:
            raise CredentialResolutionError(
                f"instance-metadata fetch failed: {e}") from e
        if not data.get("SecretAccessKey"):
            raise CredentialResolutionError(
                "metadata credential JSON missing SecretAccessKey")
        return Credentials(
            data.get("AccessKeyId", ""),
            data["SecretAccessKey"],
            data.get("Token") or None,
            _parse_rfc3339(data["Expiration"])
            if data.get("Expiration") else None)


class AssumeRoleProvider(Provider):
    """auth_assumerole.go:16-23: STS AssumeRole over base credentials.

    Builds the exact request shape the reference does — POST to
    ``{endpoint}/?Version=2011-06-15&Action=AssumeRole&...`` with an
    empty body, SigV4-signed for service ``sts`` with the base
    provider's credentials — and decodes the XML response's
    AssumeRoleResult/Credentials element (namespace-insensitively,
    like Go's local-name matching), sanity-checking SecretAccessKey
    non-empty.  ``endpoint`` defaults to
    ``https://sts.{region}.amazonaws.com`` only when
    ``allow_network`` is set; unset (this sandbox) it raises an
    actionable error instead of dialing out.
    """

    def __init__(self, base: Provider, role_arn: str,
                 session_name: str = "cga-logs-to-kinesis",
                 region: str = "us-east-1",
                 endpoint: str | None = None,
                 timeout: float = 5.0, clock=time.time):
        self.base = base
        self.role_arn = role_arn
        self.session_name = session_name
        self.region = region
        self.endpoint = endpoint
        self.timeout = timeout
        self.clock = clock

    def get(self) -> Credentials:
        from cga_logs_to_kinesis_spark.functions.sigv4 import (
            sign_request,
        )

        if not self.endpoint:
            raise CredentialResolutionError(
                f"STS endpoint not configured (role {self.role_arn}); "
                "pass endpoint= (e.g. https://sts.us-east-1."
                "amazonaws.com) to enable; chain falls through")
        base_creds = self.base.get()
        query = sorted([
            ("Version", "2011-06-15"),
            ("Action", "AssumeRole"),
            ("RoleSessionName", self.session_name),
            ("RoleArn", self.role_arn),
        ])
        parsed = urllib.parse.urlparse(self.endpoint)
        amz_date = time.strftime("%Y%m%dT%H%M%SZ",
                                 time.gmtime(self.clock()))
        headers = {"Host": parsed.netloc, "X-Amz-Date": amz_date}
        signed = sign_request(
            access_key=base_creds.access_key,
            secret_key=base_creds.secret_key,
            region=self.region, service="sts", method="POST",
            path=parsed.path or "/", query=query, headers=headers,
            payload=b"", session_token=base_creds.session_token)
        url = (f"{self.endpoint.rstrip('/')}/?"
               + urllib.parse.urlencode(query))
        req = urllib.request.Request(url, data=b"", method="POST")
        for k, v in headers.items():
            req.add_header(k, v)
        if base_creds.session_token is not None:
            req.add_header("X-Amz-Security-Token",
                           base_creds.session_token)
        req.add_header("Authorization", signed.authorization)
        try:
            with urllib.request.urlopen(  # noqa: S310
                    req, timeout=self.timeout) as resp:
                if resp.status != 200:
                    raise CredentialResolutionError(
                        f"sts:AssumeRole -> HTTP {resp.status}")
                body = resp.read()
        except (urllib.error.URLError, OSError) as e:
            raise CredentialResolutionError(
                f"sts:AssumeRole failed: {e}") from e
        return self._parse_response(body)

    @staticmethod
    def _parse_response(body: bytes) -> Credentials:
        try:
            root = ET.fromstring(body)
        except ET.ParseError as e:
            raise CredentialResolutionError(
                f"sts:AssumeRole returned unparseable XML: {e}") from e

        def find(elem, name):        # namespace-insensitive, like Go
            for child in elem.iter():
                if child.tag.split("}")[-1] == name:
                    return child
            return None

        creds = find(root, "Credentials")
        if creds is None:
            raise CredentialResolutionError(
                "sts:AssumeRole response missing Credentials")
        vals = {c.tag.split("}")[-1]: (c.text or "") for c in creds}
        if not vals.get("SecretAccessKey"):
            raise CredentialResolutionError(
                "sts:AssumeRole returned bad data (empty "
                "SecretAccessKey)")
        return Credentials(
            vals.get("AccessKeyId", ""),
            vals["SecretAccessKey"],
            vals.get("SessionToken") or None,
            _parse_rfc3339(vals["Expiration"])
            if vals.get("Expiration") else None)


class ChainProvider(Provider):
    """main.go:64-79's resolution order: the first provider that
    yields credentials wins; only if all fail does resolution fail."""

    def __init__(self, providers: list[Provider]):
        self.providers = providers

    def get(self) -> Credentials:
        errors = []
        for p in self.providers:
            try:
                return p.get()
            except CredentialResolutionError as e:
                errors.append(f"{type(p).__name__}: {e}")
        raise CredentialResolutionError(
            "no provider resolved credentials: " + "; ".join(errors))


class CachedProvider(Provider):
    """auth_cachedmutexedwarmedup.go: one lock around refresh, the
    cached credentials served until ``refresh_window`` seconds before
    expiry (static credentials never refresh).  ``clock`` is
    injectable so expiry is unit-tested, not slept through.

    A refresh attempt inside the window that FAILS falls back to the
    cached credentials while they are still actually valid — the
    reference only refreshes past true expiry, so a transient
    STS/metadata blip must not fail requests refresh_window seconds
    early.  Once genuinely expired, the failure propagates.
    """

    def __init__(self, inner: Provider, refresh_window: float = 60.0,
                 clock=time.time):
        self.inner = inner
        self.refresh_window = refresh_window
        self.clock = clock
        self._lock = threading.Lock()
        self._cached: Credentials | None = None

    def get(self) -> Credentials:
        with self._lock:
            c = self._cached
            if c is None or c.expires_within(self.refresh_window,
                                             self.clock()):
                try:
                    self._cached = self.inner.get()
                except CredentialResolutionError:
                    if c is None or c.expires_within(0, self.clock()):
                        raise
                    # still valid: serve stale, retry next get()
            return self._cached


def default_chain(env: dict | None = None,
                  role_arn: str | None = None) -> Provider:
    """The reference's assembled chain: static env first, then the
    metadata role, optionally wrapped in AssumeRole — cached with the
    expiry-aware mutex either way."""
    base: Provider = ChainProvider([
        StaticEnvProvider(env),
        InstanceMetadataProvider(env=env),
    ])
    if role_arn is not None:
        base = AssumeRoleProvider(base, role_arn)
    return CachedProvider(base)
