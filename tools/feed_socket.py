#!/usr/bin/env python3
"""Dev-only netcat replacement for driving graft.streaming.CepRunner:
listen on a port; for every accepted connection, stream lines appended
to the given file (tail -f style). Usage: feed_socket.py PORT FILE"""
import socket
import sys
import threading
import time


def serve(conn, path):
    try:
        with open(path, "r") as f:
            while True:
                line = f.readline()
                if line:
                    conn.sendall(line.encode())
                else:
                    time.sleep(0.05)
    except (BrokenPipeError, ConnectionResetError, OSError):
        pass


def main():
    port, path = int(sys.argv[1]), sys.argv[2]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", port))
    srv.listen(16)
    print(f"listening on {port}, feeding {path}", flush=True)
    while True:
        conn, _ = srv.accept()
        threading.Thread(target=serve, args=(conn, path), daemon=True).start()


if __name__ == "__main__":
    main()
