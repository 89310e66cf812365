#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
/* mirror of reference msa_struct.h layout (for test dumping only) */
struct msa_seq{ char* name; char* seq; uint8_t* s; int* gaps; float* confidence; int rank; int len; int alloc_len; };
struct msa{ struct msa_seq** sequences; /* rest unused */ };
extern int dssim_get_fasta(struct msa **msa, int n_seq, int n_obs, int dna, int len, int seed);
int main(int argc, char** argv){
    struct msa* m = 0;
    int n = atoi(argv[1]); int dna = atoi(argv[2]); int len = atoi(argv[3]); int seed = atoi(argv[4]);
    dssim_get_fasta(&m, n, 10, dna, len, seed);
    for(int i = 0; i < n; i++) printf(">%s\n%s\n", m->sequences[i]->name, m->sequences[i]->seq);
    return 0;
}
