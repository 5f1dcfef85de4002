"""Binary RPC plane (cproto analog): varint wire serializer, framed
protocol, asyncio server, sync client. Reference: cpp_src/net/cproto/ +
server/rpcserver.cc (SURVEY.md §2.3)."""
