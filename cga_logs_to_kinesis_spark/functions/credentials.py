"""Credential chain (K3) — pure stdlib.

The reference resolves credentials as: static env keys → EC2
instance-metadata role → optional STS AssumeRole, each wrapped in an
expiry-aware mutexed cache (main.go:64-79, auth_static.go,
auth_metadata.go, auth_assumerole.go, auth_cachedmutexedwarmedup.go).
This module re-expresses that chain with the same division:

* :class:`StaticEnvProvider` — AWS_ACCESS_KEY_ID / SECRET / TOKEN;
* :class:`InstanceMetadataProvider` / :class:`AssumeRoleProvider` —
  the network providers, present as protocol members but GATED (this
  container has no metadata endpoint and no STS): constructing them
  is fine, ``get()`` raises ``CredentialResolutionError`` with an
  actionable message, so a chain containing them degrades exactly
  like the reference's chain does off-EC2;
* :class:`ChainProvider` — first provider that resolves wins;
* :class:`CachedProvider` — the cachedmutexedwarmedup shape: a lock
  around refresh, credentials reused until ``refresh_window`` before
  expiry, injectable clock so the expiry behavior is TESTED rather
  than waited for.

The signer (functions/sigv4.py) consumes the resolved credentials;
production transports still prefer boto3's chain when present.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass


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


class InstanceMetadataProvider(Provider):
    """auth_metadata.go: the 169.254.169.254 role credentials.
    Network-gated — this container has no metadata service; on EC2
    the implementation is an HTTP GET of
    /latest/meta-data/iam/security-credentials/<role> returning
    (AccessKeyId, SecretAccessKey, Token, Expiration)."""

    def get(self) -> Credentials:
        raise CredentialResolutionError(
            "no EC2 instance-metadata endpoint in this environment; "
            "chain falls through (use StaticEnvProvider or boto3)")


class AssumeRoleProvider(Provider):
    """auth_assumerole.go: STS AssumeRole over base credentials.
    Network-gated for the same reason; the real call is a SigV4-signed
    sts:AssumeRole whose response carries temporary keys + Expiration
    (functions/sigv4.py can sign it)."""

    def __init__(self, base: Provider, role_arn: str):
        self.base = base
        self.role_arn = role_arn

    def get(self) -> Credentials:
        raise CredentialResolutionError(
            f"STS unreachable in this environment (role "
            f"{self.role_arn}); chain falls through")


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
    injectable so expiry is unit-tested, not slept through."""

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
                self._cached = self.inner.get()
            return self._cached


def default_chain(env: dict | None = None,
                  role_arn: str | None = None) -> Provider:
    """The reference's assembled chain: static env first, then the
    metadata role, optionally wrapped in AssumeRole — cached with the
    expiry-aware mutex either way."""
    base: Provider = ChainProvider([
        StaticEnvProvider(env),
        InstanceMetadataProvider(),
    ])
    if role_arn is not None:
        base = AssumeRoleProvider(base, role_arn)
    return CachedProvider(base)
