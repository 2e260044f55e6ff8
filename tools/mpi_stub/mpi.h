/* Minimal single-rank MPI stub — build harness for the REFERENCE solver.
 *
 * This header lets us compile the upstream C++/MPI reference (read-only at
 * /root/reference) without an MPI installation so its single-rank binary
 * can generate golden regression/output files and throughput baselines.
 * It implements exactly the API surface the reference uses, with
 * single-process semantics: collectives are no-ops or local copies,
 * point-to-point aborts (never exercised at 1 rank), and datatypes track
 * byte extents so MPI_Scatter/Reduce copy the right sizes.
 *
 * This is OUR tooling (not part of the TPU framework's runtime).
 */
#ifndef AITHER_MPI_STUB_H
#define AITHER_MPI_STUB_H

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <map>

typedef long MPI_Aint;
typedef int MPI_Datatype;
typedef int MPI_Comm;
typedef int MPI_Op;

typedef struct {
  int MPI_SOURCE;
  int MPI_TAG;
  int MPI_ERROR;
  int count_;
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

inline int MPI_Init(int *, char ***) { return MPI_SUCCESS; }
inline int MPI_Finalize() { return MPI_SUCCESS; }
inline int MPI_Comm_size(MPI_Comm, int *size) { *size = 1; return MPI_SUCCESS; }
inline int MPI_Comm_rank(MPI_Comm, int *rank) { *rank = 0; return MPI_SUCCESS; }
inline int MPI_Barrier(MPI_Comm) { return MPI_SUCCESS; }
inline int MPI_Get_version(int *v, int *sv) { *v = 3; *sv = 1; return MPI_SUCCESS; }
inline int MPI_Get_address(const void *loc, MPI_Aint *addr) {
  *addr = (MPI_Aint)loc;
  return MPI_SUCCESS;
}

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
inline int MPI_Op_create(MPI_User_function *, int, MPI_Op *op) {
  *op = 42;
  return MPI_SUCCESS;
}
inline int MPI_Op_free(MPI_Op *) { return MPI_SUCCESS; }

inline int MPI_Bcast(void *, int, MPI_Datatype, int, MPI_Comm) {
  return MPI_SUCCESS;  /* root == only rank */
}

inline int MPI_Reduce(const void *sendbuf, void *recvbuf, int count,
                      MPI_Datatype dt, MPI_Op, int, MPI_Comm) {
  if (sendbuf != MPI_IN_PLACE && sendbuf != recvbuf) {
    std::memcpy(recvbuf, sendbuf, count * mpiStubExtents()[dt]);
  }
  return MPI_SUCCESS;
}

inline int MPI_Scatter(const void *sendbuf, int sendcount, MPI_Datatype sdt,
                       void *recvbuf, int, MPI_Datatype, int, MPI_Comm) {
  if (sendbuf != recvbuf) {
    std::memcpy(recvbuf, sendbuf, sendcount * mpiStubExtents()[sdt]);
  }
  return MPI_SUCCESS;
}

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

/* point-to-point: unreachable at 1 rank (rank 0 never sends to itself) */
inline int MPI_Send(const void *, int, MPI_Datatype, int, int, MPI_Comm) {
  std::fprintf(stderr, "MPI stub: MPI_Send called in single-rank build\n");
  std::abort();
}
inline int MPI_Recv(void *, int, MPI_Datatype, int, int, MPI_Comm,
                    MPI_Status *) {
  std::fprintf(stderr, "MPI stub: MPI_Recv called in single-rank build\n");
  std::abort();
}
inline int MPI_Probe(int, int, MPI_Comm, MPI_Status *) {
  std::fprintf(stderr, "MPI stub: MPI_Probe called in single-rank build\n");
  std::abort();
}
inline int MPI_Get_count(const MPI_Status *st, MPI_Datatype dt, int *count) {
  *count = st->count_ / (int)mpiStubExtents()[dt];
  return MPI_SUCCESS;
}
inline int MPI_Sendrecv_replace(void *, int, MPI_Datatype, int, int, int, int,
                                MPI_Comm, MPI_Status *) {
  return MPI_SUCCESS;  /* self-exchange is the identity */
}

#endif  /* AITHER_MPI_STUB_H */
