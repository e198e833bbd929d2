#!/usr/bin/env bash
sbt -batch test
