#!/bin/bash
# Spark Connect distribution-surface demo: start a Spark Connect server
# (gRPC) on a probe-bound free port, then drive it from a separate thin
# client JVM (graft.ConnectDemo) over sc://. Prints CONNECT_DEMO_OK.
#
# Usage: tools/connect_demo.sh [sfDir]
set -e
SFDIR="${1:-/root/testdata/sf0.001}"
JARS=/opt/spark/jars
CLIENT_JAR="$JARS/connect-repl/spark-connect-client-jvm_2.13-4.1.2.jar"
PORT=$(python3 -c 'import socket; s=socket.socket(); s.bind(("",0)); print(s.getsockname()[1]); s.close()')
LOG=$(mktemp /tmp/graft_connect_server.XXXXXX.log)

ADD_OPENS=(
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
)

java "${ADD_OPENS[@]}" \
  -Dspark.master=local[4] \
  -Dspark.ui.enabled=false \
  -Dspark.sql.shuffle.partitions=4 \
  -Dspark.connect.grpc.binding.port="$PORT" \
  -cp "$JARS/*" \
  org.apache.spark.sql.connect.service.SparkConnectServer >"$LOG" 2>&1 &
SERVER_PID=$!
trap 'kill "$SERVER_PID" 2>/dev/null || true' EXIT

# wait (max ~60 s) for the gRPC port to accept; fail fast if the server dies
for i in $(seq 1 120); do
  if ! kill -0 "$SERVER_PID" 2>/dev/null; then
    echo "connect server died during startup; log tail:" >&2
    tail -20 "$LOG" >&2
    exit 1
  fi
  if (exec 3<>"/dev/tcp/localhost/$PORT") 2>/dev/null; then exec 3>&-; break; fi
  if [ "$i" = 120 ]; then echo "connect server never bound :$PORT" >&2; exit 1; fi
  sleep 0.5
done

# spark.api.mode=connect makes the unified builder dispatch .remote() to
# the Connect client implementation (classic wins by default when both
# are on the classpath)
java "${ADD_OPENS[@]}" \
  -Dspark.api.mode=connect \
  -cp "/root/repo/target/scala-2.13/classes:$CLIENT_JAR:$JARS/*" \
  graft.ConnectDemo "$PORT" "$SFDIR"
