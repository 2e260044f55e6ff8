/* Minimal MPI implementation — build harness for the REFERENCE solver.
 *
 * This header lets us compile the upstream C++/MPI reference (read-only at
 * /root/reference) without an MPI installation so its binary can generate
 * golden regression/output files and throughput baselines at ANY rank
 * count.  It implements exactly the API surface the reference uses:
 *
 *   - single-rank (default): collectives are no-ops/local copies.
 *   - multi-rank (MPI_STUB_NPROCS=N): MPI_Init forks N-1 child processes;
 *     every ordered pair of ranks shares one full-duplex Unix socketpair.
 *     Point-to-point messages are framed {tag, nbytes, payload} with
 *     per-source reorder queues (the reference only ever recvs from a
 *     specific (source, tag)).  MPI_Sendrecv_replace — the reference's
 *     halo-swap primitive (slices.cpp:260, multiArray3d.hpp:1483) — uses a
 *     poll()-driven simultaneous read/write loop so two ranks exchanging
 *     multi-MB buffers never deadlock on kernel socket buffers.
 *     Collectives (Bcast/Reduce/Scatter/Barrier) are built on the same
 *     framed transport; MPI_Reduce applies builtin MPI_SUM or the
 *     registered user function (function pointers are identical across
 *     forked images, so the reference's custom MAX_LINF op just works).
 *
 * Datatypes track byte extents only: every derived type the reference
 * builds (vec3d, tensor, uncoupledScalar, DOUBLE_5INT, connection — all
 * fixed-size PODs, parallel.cpp:188-320) is contiguous in memory, so
 * Pack/Unpack/Send of `count` elements is a memcpy of count*extent bytes.
 *
 * This is OUR tooling (not part of the TPU framework's runtime).
 */
#ifndef AITHER_MPI_STUB_H
#define AITHER_MPI_STUB_H

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <limits>
#include <map>
#include <vector>

#include <poll.h>
#include <sys/socket.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>

typedef long MPI_Aint;
typedef int MPI_Datatype;
typedef int MPI_Comm;
typedef int MPI_Op;

typedef struct {
  int MPI_SOURCE;
  int MPI_TAG;
  int MPI_ERROR;
  long count_;
} MPI_Status;

typedef void(MPI_User_function)(void *, void *, int *, MPI_Datatype *);

#define MPI_COMM_WORLD 0
#define MPI_SUCCESS 0
#define MPI_SUM 1
#define MPI_IN_PLACE ((void *)-1)

/* builtin datatype handles; extents looked up in mpiStubExtents() */
#define MPI_CHAR 1
#define MPI_INT 2
#define MPI_DOUBLE 3
#define MPI_C_BOOL 4
#define MPI_CXX_BOOL 5
#define MPI_PACKED 6

inline std::map<int, MPI_Aint> &mpiStubExtents() {
  static std::map<int, MPI_Aint> ext{{MPI_CHAR, 1},   {MPI_INT, 4},
                                     {MPI_DOUBLE, 8}, {MPI_C_BOOL, 1},
                                     {MPI_CXX_BOOL, 1}, {MPI_PACKED, 1}};
  return ext;
}

inline int &mpiStubNextType() {
  static int next = 100;
  return next;
}

/* ---------------- multi-rank state ---------------- */

struct MpiStubMsg {
  int tag;
  std::vector<char> data;
};

struct MpiStubState {
  int rank = 0;
  int size = 1;
  std::vector<int> fd;                       /* socket to each peer (-1 self) */
  std::vector<std::vector<char>> stream;     /* partial-frame bytes per peer */
  std::vector<std::deque<MpiStubMsg>> queue; /* parsed msgs per peer */
  std::vector<pid_t> children;               /* rank 0 only */
  std::map<int, MPI_User_function *> ops;
};

inline MpiStubState &mpiStub() {
  static MpiStubState s;
  return s;
}

inline void mpiStubDie(const char *what) {
  std::fprintf(stderr, "MPI stub rank %d: %s failed: %s\n", mpiStub().rank,
               what, std::strerror(errno));
  std::abort();
}

/* parse complete frames out of the peer's stream buffer */
inline void mpiStubParse(int src) {
  MpiStubState &s = mpiStub();
  std::vector<char> &b = s.stream[src];
  size_t off = 0;
  while (b.size() - off >= sizeof(int) + sizeof(long)) {
    int tag;
    long n;
    std::memcpy(&tag, b.data() + off, sizeof(int));
    std::memcpy(&n, b.data() + off + sizeof(int), sizeof(long));
    if (b.size() - off - sizeof(int) - sizeof(long) < (size_t)n) break;
    MpiStubMsg m;
    m.tag = tag;
    m.data.assign(b.data() + off + sizeof(int) + sizeof(long),
                  b.data() + off + sizeof(int) + sizeof(long) + n);
    s.queue[src].push_back(std::move(m));
    off += sizeof(int) + sizeof(long) + n;
  }
  if (off) b.erase(b.begin(), b.begin() + off);
}

/* blocking read of at least one byte into the stream buffer */
inline void mpiStubReadSome(int src) {
  MpiStubState &s = mpiStub();
  char tmp[1 << 16];
  ssize_t n;
  do {
    n = read(s.fd[src], tmp, sizeof(tmp));
  } while (n < 0 && errno == EINTR);
  if (n <= 0) mpiStubDie("read");
  s.stream[src].insert(s.stream[src].end(), tmp, tmp + n);
  mpiStubParse(src);
}

/* find (and optionally pop) the first queued message matching tag */
inline MpiStubMsg *mpiStubFind(int src, int tag) {
  for (MpiStubMsg &m : mpiStub().queue[src])
    if (m.tag == tag) return &m;
  return nullptr;
}

inline void mpiStubWaitFor(int src, int tag) {
  while (!mpiStubFind(src, tag)) mpiStubReadSome(src);
}

inline void mpiStubSendBytes(int dest, int tag, const void *buf, long n) {
  MpiStubState &s = mpiStub();
  std::vector<char> hdr(sizeof(int) + sizeof(long));
  std::memcpy(hdr.data(), &tag, sizeof(int));
  std::memcpy(hdr.data() + sizeof(int), &n, sizeof(long));
  const char *parts[2] = {hdr.data(), (const char *)buf};
  long sizes[2] = {(long)hdr.size(), n};
  for (int p = 0; p < 2; ++p) {
    long off = 0;
    while (off < sizes[p]) {
      ssize_t w = write(s.fd[dest], parts[p] + off, sizes[p] - off);
      if (w < 0 && errno == EINTR) continue;
      if (w < 0) mpiStubDie("write");
      off += w;
    }
  }
}

inline void mpiStubRecvBytes(int src, int tag, void *buf, long cap,
                             MPI_Status *st) {
  mpiStubWaitFor(src, tag);
  std::deque<MpiStubMsg> &q = mpiStub().queue[src];
  for (size_t i = 0; i < q.size(); ++i) {
    if (q[i].tag == tag) {
      long n = (long)q[i].data.size();
      if (n > cap) {
        std::fprintf(stderr, "MPI stub: recv overflow (%ld > %ld)\n", n, cap);
        std::abort();
      }
      std::memcpy(buf, q[i].data.data(), n);
      if (st) {
        st->MPI_SOURCE = src;
        st->MPI_TAG = tag;
        st->MPI_ERROR = MPI_SUCCESS;
        st->count_ = n;
      }
      q.erase(q.begin() + i);
      return;
    }
  }
}

/* ---------------- init / teardown ---------------- */

inline int MPI_Init(int *, char ***) {
  MpiStubState &s = mpiStub();
  const char *env = std::getenv("MPI_STUB_NPROCS");
  int n = env ? std::atoi(env) : 1;
  if (n <= 1) return MPI_SUCCESS;
  s.size = n;
  /* one socketpair per unordered pair, created before any fork */
  std::vector<std::vector<int>> sp(n, std::vector<int>(n, -1));
  std::vector<std::vector<int>> sp2(n, std::vector<int>(n, -1));
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j) {
      int fds[2];
      if (socketpair(AF_UNIX, SOCK_STREAM, 0, fds) != 0)
        mpiStubDie("socketpair");
      int mb = 4 << 20;
      setsockopt(fds[0], SOL_SOCKET, SO_SNDBUF, &mb, sizeof(mb));
      setsockopt(fds[1], SOL_SOCKET, SO_SNDBUF, &mb, sizeof(mb));
      sp[i][j] = fds[0];  /* rank i's end */
      sp2[i][j] = fds[1]; /* rank j's end */
    }
  s.rank = 0;
  for (int r = 1; r < n; ++r) {
    pid_t pid = fork();
    if (pid < 0) mpiStubDie("fork");
    if (pid == 0) {
      s.rank = r;
      s.children.clear();
      break;
    }
    s.children.push_back(pid);
  }
  /* keep only this rank's ends */
  s.fd.assign(n, -1);
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j) {
      int mine = -1;
      if (s.rank == i) mine = sp[i][j];
      if (s.rank == j) mine = sp2[i][j];
      if (mine >= 0)
        s.fd[s.rank == i ? j : i] = mine;
      else {
        close(sp[i][j]);
        close(sp2[i][j]);
      }
    }
  s.stream.resize(n);
  s.queue.resize(n);
  return MPI_SUCCESS;
}

inline int MPI_Finalize() {
  MpiStubState &s = mpiStub();
  int bad = 0;
  for (pid_t pid : s.children) {
    int st = 0;
    waitpid(pid, &st, 0);
    if (!WIFEXITED(st) || WEXITSTATUS(st) != 0) bad = 1;
  }
  for (int f : s.fd)
    if (f >= 0) close(f);
  if (bad) {
    std::fprintf(stderr, "MPI stub: a child rank exited abnormally\n");
    std::exit(1);
  }
  return MPI_SUCCESS;
}

inline int MPI_Comm_size(MPI_Comm, int *size) {
  *size = mpiStub().size;
  return MPI_SUCCESS;
}
inline int MPI_Comm_rank(MPI_Comm, int *rank) {
  *rank = mpiStub().rank;
  return MPI_SUCCESS;
}
inline int MPI_Get_version(int *v, int *sv) { *v = 3; *sv = 1; return MPI_SUCCESS; }
inline int MPI_Get_address(const void *loc, MPI_Aint *addr) {
  *addr = (MPI_Aint)loc;
  return MPI_SUCCESS;
}

/* reserved internal tags (reference tags are small ints / global positions) */
#define MPI_STUB_TAG_BARRIER 0x7f000001
#define MPI_STUB_TAG_BCAST 0x7f000002
#define MPI_STUB_TAG_REDUCE 0x7f000003
#define MPI_STUB_TAG_SCATTER 0x7f000004

inline int MPI_Barrier(MPI_Comm) {
  MpiStubState &s = mpiStub();
  if (s.size == 1) return MPI_SUCCESS;
  char tok = 0;
  if (s.rank == 0) {
    MPI_Status st;
    for (int r = 1; r < s.size; ++r)
      mpiStubRecvBytes(r, MPI_STUB_TAG_BARRIER, &tok, 1, &st);
    for (int r = 1; r < s.size; ++r)
      mpiStubSendBytes(r, MPI_STUB_TAG_BARRIER, &tok, 1);
  } else {
    mpiStubSendBytes(0, MPI_STUB_TAG_BARRIER, &tok, 1);
    MPI_Status st;
    mpiStubRecvBytes(0, MPI_STUB_TAG_BARRIER, &tok, 1, &st);
  }
  return MPI_SUCCESS;
}

/* ---------------- datatypes ---------------- */

inline int MPI_Type_contiguous(int count, MPI_Datatype old, MPI_Datatype *nt) {
  *nt = mpiStubNextType()++;
  mpiStubExtents()[*nt] = count * mpiStubExtents()[old];
  return MPI_SUCCESS;
}

inline int MPI_Type_create_struct(int count, const int *lens,
                                  const MPI_Aint *displs,
                                  const MPI_Datatype *types,
                                  MPI_Datatype *nt) {
  MPI_Aint end = 0;
  for (int i = 0; i < count; ++i) {
    MPI_Aint e = displs[i] + lens[i] * mpiStubExtents()[types[i]];
    if (e > end) end = e;
  }
  *nt = mpiStubNextType()++;
  mpiStubExtents()[*nt] = end;
  return MPI_SUCCESS;
}

inline int MPI_Type_get_extent(MPI_Datatype dt, MPI_Aint *lb, MPI_Aint *ext) {
  *lb = 0;
  *ext = mpiStubExtents()[dt];
  return MPI_SUCCESS;
}

inline int MPI_Type_create_resized(MPI_Datatype old, MPI_Aint, MPI_Aint ext,
                                   MPI_Datatype *nt) {
  *nt = mpiStubNextType()++;
  mpiStubExtents()[*nt] = ext;
  (void)old;
  return MPI_SUCCESS;
}

inline int MPI_Type_commit(MPI_Datatype *) { return MPI_SUCCESS; }
inline int MPI_Type_free(MPI_Datatype *) { return MPI_SUCCESS; }
inline int MPI_Op_create(MPI_User_function *fn, int, MPI_Op *op) {
  static int next = 42;
  *op = next++;
  mpiStub().ops[*op] = fn;
  return MPI_SUCCESS;
}
inline int MPI_Op_free(MPI_Op *) { return MPI_SUCCESS; }

/* ---------------- collectives ---------------- */

inline int MPI_Bcast(void *buf, int count, MPI_Datatype dt, int root,
                     MPI_Comm) {
  MpiStubState &s = mpiStub();
  if (s.size == 1) return MPI_SUCCESS;
  long n = (long)count * mpiStubExtents()[dt];
  if (s.rank == root) {
    for (int r = 0; r < s.size; ++r)
      if (r != root) mpiStubSendBytes(r, MPI_STUB_TAG_BCAST, buf, n);
  } else {
    MPI_Status st;
    mpiStubRecvBytes(root, MPI_STUB_TAG_BCAST, buf, n, &st);
  }
  return MPI_SUCCESS;
}

inline void mpiStubCombine(MPI_Op op, void *in, void *inout, int count,
                           MPI_Datatype dt) {
  if (op == MPI_SUM) {
    if (dt == MPI_DOUBLE) {
      double *a = (double *)in, *b = (double *)inout;
      for (int i = 0; i < count; ++i) b[i] += a[i];
    } else if (dt == MPI_INT) {
      int *a = (int *)in, *b = (int *)inout;
      for (int i = 0; i < count; ++i) b[i] += a[i];
    } else {
      std::fprintf(stderr, "MPI stub: MPI_SUM on unsupported type\n");
      std::abort();
    }
    return;
  }
  MPI_User_function *fn = mpiStub().ops[op];
  if (!fn) {
    std::fprintf(stderr, "MPI stub: unknown reduce op\n");
    std::abort();
  }
  fn(in, inout, &count, &dt);
}

inline int MPI_Reduce(const void *sendbuf, void *recvbuf, int count,
                      MPI_Datatype dt, MPI_Op op, int root, MPI_Comm) {
  MpiStubState &s = mpiStub();
  long n = (long)count * mpiStubExtents()[dt];
  if (s.size == 1) {
    if (sendbuf != MPI_IN_PLACE && sendbuf != recvbuf)
      std::memcpy(recvbuf, sendbuf, n);
    return MPI_SUCCESS;
  }
  if (s.rank != root) {
    const void *src = (sendbuf == MPI_IN_PLACE) ? recvbuf : sendbuf;
    mpiStubSendBytes(root, MPI_STUB_TAG_REDUCE, src, n);
    return MPI_SUCCESS;
  }
  if (sendbuf != MPI_IN_PLACE && sendbuf != recvbuf)
    std::memcpy(recvbuf, sendbuf, n);
  std::vector<char> tmp(n);
  MPI_Status st;
  for (int r = 0; r < s.size; ++r) {
    if (r == root) continue;
    mpiStubRecvBytes(r, MPI_STUB_TAG_REDUCE, tmp.data(), n, &st);
    mpiStubCombine(op, tmp.data(), recvbuf, count, dt);
  }
  return MPI_SUCCESS;
}

inline int MPI_Scatter(const void *sendbuf, int sendcount, MPI_Datatype sdt,
                       void *recvbuf, int recvcount, MPI_Datatype rdt,
                       int root, MPI_Comm) {
  MpiStubState &s = mpiStub();
  long n = (long)sendcount * mpiStubExtents()[sdt];
  if (s.size == 1) {
    if (sendbuf != recvbuf) std::memcpy(recvbuf, sendbuf, n);
    return MPI_SUCCESS;
  }
  if (s.rank == root) {
    const char *base = (const char *)sendbuf;
    for (int r = 0; r < s.size; ++r) {
      if (r == root)
        std::memcpy(recvbuf, base + (long)r * n, n);
      else
        mpiStubSendBytes(r, MPI_STUB_TAG_SCATTER, base + (long)r * n, n);
    }
  } else {
    long rn = (long)recvcount * mpiStubExtents()[rdt];
    MPI_Status st;
    mpiStubRecvBytes(root, MPI_STUB_TAG_SCATTER, recvbuf, rn, &st);
  }
  return MPI_SUCCESS;
}

/* ---------------- pack ---------------- */

inline int MPI_Pack_size(int incount, MPI_Datatype dt, MPI_Comm, int *size) {
  *size = incount * (int)mpiStubExtents()[dt];
  return MPI_SUCCESS;
}

inline int MPI_Pack(const void *inbuf, int incount, MPI_Datatype dt,
                    void *outbuf, int outsize, int *position, MPI_Comm) {
  int bytes = incount * (int)mpiStubExtents()[dt];
  if (*position + bytes > outsize) {
    std::fprintf(stderr, "MPI stub: pack overflow\n");
    std::abort();
  }
  std::memcpy((char *)outbuf + *position, inbuf, bytes);
  *position += bytes;
  return MPI_SUCCESS;
}

inline int MPI_Unpack(const void *inbuf, int, int *position, void *outbuf,
                      int outcount, MPI_Datatype dt, MPI_Comm) {
  int bytes = outcount * (int)mpiStubExtents()[dt];
  std::memcpy(outbuf, (const char *)inbuf + *position, bytes);
  *position += bytes;
  return MPI_SUCCESS;
}

/* ---------------- point-to-point ---------------- */

inline int MPI_Send(const void *buf, int count, MPI_Datatype dt, int dest,
                    int tag, MPI_Comm) {
  MpiStubState &s = mpiStub();
  if (s.size == 1 || dest == s.rank) {
    std::fprintf(stderr, "MPI stub: MPI_Send to self\n");
    std::abort();
  }
  mpiStubSendBytes(dest, tag, buf, (long)count * mpiStubExtents()[dt]);
  return MPI_SUCCESS;
}

inline int MPI_Recv(void *buf, int count, MPI_Datatype dt, int source, int tag,
                    MPI_Comm, MPI_Status *st) {
  mpiStubRecvBytes(source, tag, buf, (long)count * mpiStubExtents()[dt], st);
  return MPI_SUCCESS;
}

inline int MPI_Probe(int source, int tag, MPI_Comm, MPI_Status *st) {
  mpiStubWaitFor(source, tag);
  MpiStubMsg *m = mpiStubFind(source, tag);
  st->MPI_SOURCE = source;
  st->MPI_TAG = tag;
  st->MPI_ERROR = MPI_SUCCESS;
  st->count_ = (long)m->data.size();
  return MPI_SUCCESS;
}

inline int MPI_Get_count(const MPI_Status *st, MPI_Datatype dt, int *count) {
  *count = (int)(st->count_ / mpiStubExtents()[dt]);
  return MPI_SUCCESS;
}

/* Simultaneous exchange: poll-driven interleaved write/read so two ranks
 * swapping multi-MB halo buffers can't deadlock on socket buffers. */
inline int MPI_Sendrecv_replace(void *buf, int count, MPI_Datatype dt,
                                int dest, int sendtag, int source, int recvtag,
                                MPI_Comm, MPI_Status *st) {
  MpiStubState &s = mpiStub();
  if (s.size == 1 || (dest == s.rank && source == s.rank))
    return MPI_SUCCESS; /* self-exchange is the identity */
  if (dest != source) {
    std::fprintf(stderr, "MPI stub: sendrecv_replace dest != source\n");
    std::abort();
  }
  long n = (long)count * mpiStubExtents()[dt];
  std::vector<char> frame(sizeof(int) + sizeof(long) + n);
  std::memcpy(frame.data(), &sendtag, sizeof(int));
  std::memcpy(frame.data() + sizeof(int), &n, sizeof(long));
  std::memcpy(frame.data() + sizeof(int) + sizeof(long), buf, n);
  long sent = 0;
  int fd = s.fd[dest];
  while (true) {
    if (mpiStubFind(source, recvtag)) break;
    struct pollfd p;
    p.fd = fd;
    p.events = (short)(POLLIN | (sent < (long)frame.size() ? POLLOUT : 0));
    p.revents = 0;
    if (poll(&p, 1, -1) < 0) {
      if (errno == EINTR) continue;
      mpiStubDie("poll");
    }
    if ((p.revents & POLLOUT) && sent < (long)frame.size()) {
      ssize_t w = send(fd, frame.data() + sent, frame.size() - sent,
                       MSG_DONTWAIT);
      if (w < 0 && (errno == EAGAIN || errno == EINTR)) w = 0;
      if (w < 0) mpiStubDie("send");
      sent += w;
    }
    if (p.revents & POLLIN) mpiStubReadSome(source);
  }
  /* finish pushing our frame (peer is draining — it posted the same call) */
  while (sent < (long)frame.size()) {
    ssize_t w = write(fd, frame.data() + sent, frame.size() - sent);
    if (w < 0 && errno == EINTR) continue;
    if (w < 0) mpiStubDie("write");
    sent += w;
  }
  mpiStubRecvBytes(source, recvtag, buf, n, st);
  return MPI_SUCCESS;
}

#endif /* AITHER_MPI_STUB_H */
