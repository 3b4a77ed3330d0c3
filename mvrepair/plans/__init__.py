"""Prebuilt logical plans / derived datasets for the fixture harness."""
