#!/bin/bash
# Fetch a film from the MoMaF OpenStack Swift object store if missing.
#
# Reference counterpart: /root/reference/facerec/download.sh.  Requires
# OS_STORAGE_URL and OS_AUTH_TOKEN in the environment (`swift auth` or
# application credentials).
set -euo pipefail

FILE=${1:?usage: download.sh <film-file>}
CONTAINER=${MOMAF_CONTAINER:-momaf-films-20221223}

if [ -e "$FILE" ]; then
  echo "$FILE already exists"
  exit 0
fi

: "${OS_STORAGE_URL:?OS_STORAGE_URL not set (see 'swift auth')}"
: "${OS_AUTH_TOKEN:?OS_AUTH_TOKEN not set (see 'swift auth')}"

NAME=$(basename "$FILE")
echo "Fetching $NAME from container $CONTAINER"
if command -v swift >/dev/null; then
  swift download "$CONTAINER" "$NAME" -o "$FILE"
else
  curl -fSL -H "X-Auth-Token: $OS_AUTH_TOKEN" \
    "$OS_STORAGE_URL/$CONTAINER/$NAME" -o "$FILE"
fi
