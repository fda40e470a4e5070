"""Shared adversarial-input corpora for tests and standalone hunts."""
